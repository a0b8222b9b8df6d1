"""negative_sampling (operators/sampling.py) — staged-tier op at
driver rigor: DuckDB oracle parity plus the sampler's contract — no
sampled pair is a positive, draws are deterministic and seed-scoped,
per-user output is capped at K with contiguous ranks, and a user
whose positives blanket the vocabulary honestly yields nothing."""

from __future__ import annotations

from customer_churn_prediction_spark.operators import sampling

from .oracle_utils import assert_matches_oracle


def test_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sampling.negative_sampling(spark, sf_dir),
        sampling.NEGATIVE_SAMPLING_ORACLE,
        sf_dir,
    )


def test_no_negative_is_a_positive(spark, sf_smoke):
    inter = sampling._interactions(spark, sf_smoke)
    negs = sampling.negative_sampling(spark, sf_smoke)
    overlap = negs.join(
        inter,
        (negs.user_id == inter.user_id) & (negs.neg_item == inter.item),
    )
    assert overlap.count() == 0


def test_per_user_cap_and_contiguous_ranks(spark, sf_smoke):
    rows = sampling.negative_sampling(spark, sf_smoke).collect()
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.rank)
    assert by_user
    for user, ranks in by_user.items():
        ranks.sort()
        assert ranks == list(range(1, len(ranks) + 1)), user
        assert len(ranks) <= sampling.K_NEG


def test_deterministic_and_seed_scoped(spark, sf_smoke):
    inter = sampling._interactions(spark, sf_smoke)
    a = set(map(tuple, sampling.negative_samples_frame(inter).collect()))
    b = set(map(tuple, sampling.negative_samples_frame(inter).collect()))
    assert a == b
    c = set(
        map(
            tuple,
            sampling.negative_samples_frame(inter, seed="other").collect(),
        )
    )
    assert c and c != a


def _adversarial_vocab(spark):
    """Item ids chosen to stress the bucketed rank: dense runs inside
    one bucket, exact bucket-boundary values, a bucket with a single
    item, wide empty-bucket gaps, and ids far past 2^32."""
    w = sampling._IDX_BUCKET_WIDTH
    items = (
        list(range(7))                      # dense run, bucket 0
        + [w - 1, w, w + 1]                 # boundary straddle
        + [5 * w + 3]                       # singleton bucket
        + [10**6, 10**6 + w]                # empty-gap neighbors
        + [2**40, 2**40 + 1]                # huge ids
    )
    return spark.createDataFrame(
        [(i,) for i in items], "item long"
    )


def test_bucketed_index_equals_exact_twin(spark, sf_dir):
    """VERDICT r11 item 4: the two-level bucketed dense rank must be
    bit-identical to the retired vocab-wide single-window form — on
    the real interaction vocabulary AND an adversarial id layout."""
    inter = sampling._interactions(spark, sf_dir)
    vocab = inter.select("item").distinct()
    got = sorted(map(tuple, sampling._dense_item_index(vocab).collect()))
    want = sorted(
        map(tuple, sampling._dense_item_index_exact(vocab).collect())
    )
    assert got == want and got

    adv = _adversarial_vocab(spark)
    got = sorted(map(tuple, sampling._dense_item_index(adv).collect()))
    want = sorted(
        map(tuple, sampling._dense_item_index_exact(adv).collect())
    )
    assert got == want
    # dense 0..V-1, order-aligned with item value
    idx_by_item = dict(got)
    items = sorted(idx_by_item)
    assert [idx_by_item[i] for i in items] == list(range(len(items)))


def test_bucketed_cdf_equals_exact_twin(spark, sf_dir):
    """Same claim for the weighted sampler's integer CDF."""
    from pyspark.sql import functions as F

    inter = sampling._interactions(spark, sf_dir)
    freq = inter.groupBy("item").agg(F.count(F.lit(1)).alias("w"))
    got = sorted(map(tuple, sampling._item_cdf(freq).collect()))
    want = sorted(map(tuple, sampling._item_cdf_exact(freq).collect()))
    assert got == want and got

    adv = _adversarial_vocab(spark).withColumn(
        "w", (F.col("item") % 7 + 1).cast("long")
    )
    got = sorted(map(tuple, sampling._item_cdf(adv).collect()))
    want = sorted(map(tuple, sampling._item_cdf_exact(adv).collect()))
    assert got == want
    # contiguous intervals: lo of the next item == hi of the previous
    seq = sorted(got, key=lambda t: t[1])
    assert seq[0][1] == 0
    for (_, _, hi_prev), (_, lo, _) in zip(seq, seq[1:]):
        assert lo == hi_prev


def test_weighted_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sampling.negative_sampling_weighted(spark, sf_dir),
        sampling.WEIGHTED_SAMPLING_ORACLE,
        sf_dir,
    )


def test_weighted_draw_prefers_popular_items(spark):
    """50 background users interact with item 1 only (weight 50);
    items 10..19 carry weight 1 each. For fresh test users whose only
    positive is item 10, the weighted sampler should hand item 1 to
    essentially everyone (p(miss)/slot = 10/60, 12 slots), while the
    uniform sampler treats item 1 as one of 11 candidates."""
    rows = (
        [(u, 1) for u in range(50)]
        + [(50 + i, 10 + i) for i in range(10)]
        + [(1000 + t, 10) for t in range(40)]
    )
    inter = spark.createDataFrame(rows, "user_id long, item int")
    weighted = sampling.weighted_negative_samples_frame(inter)
    test_users_hot = {
        r.user_id
        for r in weighted.collect()
        if r.user_id >= 1000 and r.neg_item == 1
    }
    assert len(test_users_hot) >= 38  # ~all 40
    uniform = sampling.negative_samples_frame(inter)
    uni_hot = {
        r.user_id
        for r in uniform.collect()
        if r.user_id >= 1000 and r.neg_item == 1
    }
    # uniform: item 1 is 1 of 11 vocab items; with 12 draws kept 4,
    # it must NOT dominate the test users the way the weighted draw
    # does
    assert len(uni_hot) < len(test_users_hot)


def test_weighted_no_negative_is_a_positive_and_caps_hold(spark, sf_smoke):
    inter = sampling._interactions(spark, sf_smoke)
    negs = sampling.negative_sampling_weighted(spark, sf_smoke)
    overlap = negs.join(
        inter,
        (negs.user_id == inter.user_id) & (negs.neg_item == inter.item),
    )
    assert overlap.count() == 0
    by_user: dict[int, list[int]] = {}
    for r in negs.collect():
        by_user.setdefault(r.user_id, []).append(r.rank)
    assert by_user
    for user, ranks in by_user.items():
        ranks.sort()
        assert ranks == list(range(1, len(ranks) + 1)), user
        assert len(ranks) <= sampling.K_NEG


def test_weighted_cdf_covers_every_draw(spark):
    """Every draw lands in exactly one item interval — the quantized
    bucket join must never drop or double-match a candidate (12
    slots per user before the positive anti-join)."""
    rows = [(u, u % 7) for u in range(21)]
    inter = spark.createDataFrame(rows, "user_id long, item int")
    n_users = 21
    # re-run the internal candidate join without the anti-join by
    # sampling with k*oversample slots and no positives to subtract:
    # a disjoint user set carries no positives at all
    fresh = spark.createDataFrame(
        [(100 + u, 99) for u in range(5)], "user_id long, item int"
    )
    both = inter.union(fresh)
    out = sampling.weighted_negative_samples_frame(both, k=3, oversample=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.user_id, []).append(r.neg_item)
    # the 5 fresh users (single positive: item 99, weight 5 of 26)
    # must each receive their full k=3 negatives
    for u in range(100, 105):
        assert len(got[u]) == 3, (u, got.get(u))


def test_sequence_pairs_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sampling.sequence_training_pairs(spark, sf_dir),
        sampling.SEQUENCE_PAIRS_ORACLE,
        sf_dir,
    )


def _ev_frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, item int, ts timestamp, event_id long"
    )


def test_sequence_pairs_hand_check_and_truncation(spark):
    """User 1's items in time order are 5,3,9,7: three pairs with
    growing context. With w_ctx=2 the last context truncates to the
    two MOST RECENT items (oldest dropped), and the first event emits
    nothing."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 5, t0, 10), (1, 3, t0 + dt.timedelta(minutes=1), 11),
        (1, 9, t0 + dt.timedelta(minutes=2), 12),
        (1, 7, t0 + dt.timedelta(minutes=3), 13),
    ]
    out = {
        r.pos: (r.context, r.target_item, r.ctx_len)
        for r in sampling.sequence_pairs_frame(
            _ev_frame(spark, rows), w_ctx=2
        ).collect()
    }
    assert out == {
        2: ("5", 3, 1),
        3: ("5|3", 9, 2),
        4: ("3|9", 7, 2),
    }


def test_sequence_pairs_never_leak_future(spark):
    """Every context item must come from a strictly earlier event —
    items are constructed unique-per-position so leakage is
    detectable by value."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, u * 100 + i, t0 + dt.timedelta(minutes=i), u * 1000 + i)
        for u in (1, 2) for i in range(6)
    ]
    for r in sampling.sequence_pairs_frame(_ev_frame(spark, rows)).collect():
        ctx_positions = [int(x) % 100 for x in r.context.split("|")]
        target_pos = r.target_item % 100
        assert all(p < target_pos for p in ctx_positions), r
    n_pairs = sampling.sequence_pairs_frame(
        _ev_frame(spark, rows)
    ).count()
    assert n_pairs == 2 * (6 - 1)  # n-1 examples per user


def test_split_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sampling.sequence_split_leave_last(spark, sf_dir),
        sampling.SEQUENCE_SPLIT_ORACLE,
        sf_dir,
    )


def test_leave_last_split_contract(spark, sf_smoke):
    """Exactly one valid example per user with history, it is the
    chronologically last one, and train/valid partition the pairs."""
    rows = sampling.sequence_split_leave_last(spark, sf_smoke).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        valid = [r for r in rs if r.split == "valid"]
        assert len(valid) == 1, user
        assert valid[0].pos == max(r.pos for r in rs), user
        assert all(r.split in ("train", "valid") for r in rs)


def test_split_adds_no_shuffle_over_pairs(spark, sf_smoke):
    """The split window rides the pairs window's user_id partitioning
    — same Exchange count in the executed plan."""
    from customer_churn_prediction_spark.plans.audit import (
        count_shuffle_exchanges,
    )

    pairs = sampling.sequence_training_pairs(spark, sf_smoke)
    split = sampling.sequence_split_leave_last(spark, sf_smoke)
    assert count_shuffle_exchanges(split) == count_shuffle_exchanges(
        pairs
    )


_hyp_inter = None
try:
    from hypothesis import given, settings, strategies as st

    _hyp_inter = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # user
            st.integers(min_value=0, max_value=9),   # item
        ),
        min_size=1,
        max_size=25,
    )
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


@settings(max_examples=8, deadline=None)
@given(_hyp_inter)
def test_sampler_invariants_hold_for_any_interaction_set(spark, raw):
    """For ANY small interaction multiset, both samplers must satisfy
    the full contract: no emitted negative is a positive, ranks are
    contiguous from 1, per-user count <= k, and the two samplers
    agree on WHICH users can receive negatives (those not covering
    the vocabulary)."""
    inter = spark.createDataFrame(
        sorted(set(raw)), "user_id long, item int"
    )
    pos = set(inter.collect())
    vocab = {i for _, i in pos}
    by_sampler = {}
    for name, fn in (
        ("uniform", sampling.negative_samples_frame),
        ("weighted", sampling.weighted_negative_samples_frame),
    ):
        got: dict[int, list] = {}
        for r in fn(inter, k=2, oversample=6).collect():
            assert (r.user_id, r.neg_item) not in pos, name
            assert r.neg_item in vocab, name
            got.setdefault(r.user_id, []).append(r.rank)
        for u, ranks in got.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), name
            assert len(ranks) <= 2, name
        by_sampler[name] = got
    # a user owning the whole vocabulary gets nothing from EITHER
    full_cover = {
        u
        for u in {u for u, _ in pos}
        if {i for uu, i in pos if uu == u} == vocab
    }
    for name, got in by_sampler.items():
        assert not (full_cover & set(got)), name


@settings(max_examples=8, deadline=None)
@given(_hyp_inter)
def test_pairs_invariants_hold_for_any_event_log(spark, raw):
    """For ANY event log: n_users_with_history pairs short of the
    event count, contexts only ever reference strictly earlier
    events, and ctx_len is capped by w_ctx."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, it, t0 + dt.timedelta(minutes=i), i)
        for i, (u, it) in enumerate(raw)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, item int, ts timestamp, event_id long"
    )
    out = sampling.sequence_pairs_frame(ev, w_ctx=3).collect()
    n_users = len({u for u, _ in raw})
    assert len(out) == len(raw) - n_users  # first event of each user
    for r in out:
        assert 1 <= r.ctx_len <= 3
        assert r.context.count("|") == r.ctx_len - 1
        assert r.pos >= 2


def test_full_coverage_user_yields_zero_negatives(spark):
    """User 1 has interacted with the ENTIRE vocabulary — there is no
    valid negative, and the sampler must return none rather than leak
    a positive. User 2 still gets its quota."""
    inter = spark.createDataFrame(
        [(1, i) for i in range(6)] + [(2, 0)],
        "user_id long, item int",
    )
    out = sampling.negative_samples_frame(inter, k=2, oversample=6)
    got = {}
    for r in out.collect():
        got.setdefault(r.user_id, set()).add(r.neg_item)
    assert 1 not in got
    assert len(got[2]) == 2
    assert 0 not in got[2]
