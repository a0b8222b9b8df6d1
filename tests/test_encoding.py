"""feature_target_encoding (ml/encoding.py) — staged-tier op at
driver rigor: DuckDB oracle parity, plus the three semantic
properties that make out-of-fold encoding trustworthy — no label
leakage into a row's own encoding, cold-start fallback to the
out-of-fold prior, and the degenerate one-fold NULL contract."""

from __future__ import annotations

import pytest

from customer_churn_prediction_spark.ml import encoding

from .oracle_utils import assert_matches_oracle


def test_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        encoding.feature_target_encoding(spark, sf_dir),
        encoding.TARGET_ENCODING_ORACLE,
        sf_dir,
    )


def _frame(spark, rows):
    return spark.createDataFrame(rows, "k long, cat string, label int")


def _enc_map(df):
    return {
        (r.k, r.feature): r.enc
        for r in df.collect()
    }


def test_no_leakage_flip_own_label(spark):
    """Flipping one row's label must leave the encoding of EVERY row
    in the same fold unchanged (their out-of-fold stats exclude the
    flipped fold entirely), while at least one other-fold row moves —
    the property that separates OOF encoding from plain target-mean
    encoding."""
    base = [
        (0, "a", 1), (1, "a", 0), (2, "a", 1), (3, "b", 0),
        (4, "b", 1), (5, "a", 0), (6, "b", 0), (7, "a", 1),
    ]
    flipped = [(k, c, 1 - l) if k == 0 else (k, c, l)
               for k, c, l in base]
    kw = dict(key_col="k", cat_cols=("cat",), n_folds=2, m=1.0)
    enc0 = _enc_map(encoding.target_encode_frame(_frame(spark, base), **kw))
    enc1 = _enc_map(encoding.target_encode_frame(_frame(spark, flipped), **kw))
    same_fold = [k for k, _, _ in base if k % 2 == 0]
    other_fold = [k for k, _, _ in base if k % 2 == 1]
    for k in same_fold:
        assert enc0[(k, "cat")] == enc1[(k, "cat")], k
    assert any(enc0[(k, "cat")] != enc1[(k, "cat")] for k in other_fold)


def test_cold_start_category_falls_back_to_prior(spark):
    """A category seen ONLY in the row's own fold has zero out-of-fold
    evidence: its encoding must be exactly the out-of-fold global
    prior, for any smoothing strength."""
    rows = [
        # fold 0 (even keys): the only "x" rows live here
        (0, "x", 1), (2, "x", 0), (4, "a", 1),
        # fold 1 (odd keys)
        (1, "a", 1), (3, "a", 0), (5, "a", 0), (7, "a", 1),
    ]
    out = encoding.target_encode_frame(
        _frame(spark, rows), key_col="k", cat_cols=("cat",),
        n_folds=2, m=7.0,
    )
    prior_oof_fold0 = (1 + 0 + 0 + 1) / 4  # mean label over fold 1
    got = _enc_map(out)
    assert got[(0, "cat")] == pytest.approx(prior_oof_fold0, abs=1e-6)
    assert got[(2, "cat")] == pytest.approx(prior_oof_fold0, abs=1e-6)


def test_single_fold_yields_null_not_crash(spark):
    """n_folds=1 leaves no out-of-fold rows at all: the prior is a
    0/0, which must surface as NULL (try_divide, matching the
    oracle's ANSI-free division), never a DivisionByZero crash."""
    rows = [(0, "a", 1), (1, "a", 0)]
    out = encoding.target_encode_frame(
        _frame(spark, rows), key_col="k", cat_cols=("cat",), n_folds=1,
    ).collect()
    assert len(out) == 2
    assert all(r.enc is None for r in out)


def test_unseen_oof_category_encodes_to_smoothed_evidence(spark):
    """Hand-check one cell: category 'b' rows in fold 0, with
    out-of-fold evidence only from fold 1."""
    rows = [
        (0, "b", 1), (1, "b", 1), (3, "b", 1),
        (2, "a", 0), (5, "a", 1), (7, "a", 0),
    ]
    out = encoding.target_encode_frame(
        _frame(spark, rows), key_col="k", cat_cols=("cat",),
        n_folds=2, m=2.0,
    )
    got = _enc_map(out)
    # row k=0 (fold 0, cat b): oof = odd keys; cat-b oof = {k1:1, k3:1}
    prior = (1 + 1 + 1 + 0) / 4  # odd-key labels
    want = (2 + 2.0 * prior) / (2 + 2.0)
    assert want != pytest.approx(prior)  # distinct from the fallback
    assert got[(0, "cat")] == pytest.approx(want, abs=1e-6)


def test_null_category_is_a_real_category(spark):
    """Rows with a NULL categorical must not vanish through the
    equi-join: NULL coalesces to the sentinel category and encodes
    like any other (missingness carries signal)."""
    rows = [
        (0, None, 1), (2, None, 0), (4, "a", 1),
        (1, "a", 1), (3, None, 0), (5, "a", 0), (7, "a", 1),
    ]
    out = encoding.target_encode_frame(
        _frame(spark, rows), key_col="k", cat_cols=("cat",),
        n_folds=2, m=1.0,
    ).collect()
    assert len(out) == len(rows)  # nothing dropped
    null_rows = [r for r in out if r.category == encoding.NULL_CATEGORY]
    assert {r.k for r in null_rows} == {0, 2, 3}
    assert all(r.enc is not None for r in out)
    # k=3 (fold 1): the only other-fold null row is k=0/k=2 (s=1,n=2)
    prior = (1 + 0 + 1) / 3  # labels of even keys (fold 0)
    want = (1 + 1.0 * prior) / (2 + 1.0)
    got = {r.k: r.enc for r in null_rows}
    import pytest as _pt

    assert got[3] == _pt.approx(want, abs=1e-6)


def test_empty_cat_cols_raises_clearly(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="cat_cols"):
        encoding.target_encode_frame(
            _frame(spark, [(0, "a", 1)]), key_col="k"
        )


def test_plan_broadcasts_enc_table_and_prunes_scans(spark, sf_smoke):
    """The encode table must come back as a broadcast join (its build
    side is model-sized), and the customer scan must prune to the
    three needed columns."""
    df = encoding.feature_target_encoding(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "c_acctbal" not in plan and "c_name" not in plan


def test_feature_hashing_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        encoding.feature_hashing(spark, sf_dir),
        encoding.FEATURE_HASHING_ORACLE,
        sf_dir,
    )


def test_feature_hashing_slots_and_signs_are_well_formed(spark, sf_dir):
    """Every slot lands in [0, HASH_WIDTH), signs are exactly ±1, and
    equal tokens collide deterministically (the hash IS the encoder —
    two rows with the same category must share slot AND sign)."""
    from pyspark.sql import functions as F

    df = encoding.feature_hashing(spark, sf_dir).cache()
    try:
        bad = df.where(
            (F.col("slot") < 0)
            | (F.col("slot") >= encoding.HASH_WIDTH)
            | ~F.col("sign").isin(1, -1)
        )
        assert bad.count() == 0
        # determinism per (feature, slot): sign is a function of the
        # token, so a (feature, slot) pair reached by ONE token value
        # carries one sign; categorical cardinality << WIDTH here, so
        # (feature, slot, sign) triples == (feature, slot) pairs.
        per_feature = (
            df.groupBy("feature", "slot", "sign").count()
            .groupBy("feature", "slot")
            .count()
            .where(F.col("count") > 1)
        )
        assert per_feature.count() == 0
    finally:
        df.unpersist()


def test_feature_hashing_is_a_pure_map(spark, sf_dir):
    """The whole point vs featindex/target encoding: no fit, no
    vocabulary join — ZERO shuffles in the executed plan."""
    from customer_churn_prediction_spark.plans.audit import (
        count_shuffle_exchanges,
    )

    assert count_shuffle_exchanges(
        encoding.feature_hashing(spark, sf_dir)
    ) == 0
