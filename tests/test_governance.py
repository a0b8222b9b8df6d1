"""Cross-operator semantics for the corpus-governance tier — checks
that relate the new operators to the rest of the engine instead of
restating their own definitions (the oracle tests already pin those).
"""

from pyspark.sql import functions as F

from customer_churn_prediction_spark.similarity import ann
from customer_churn_prediction_spark.text import analysis


def test_semantic_dedup_pairs_are_true_neardups(spark, sf_dir):
    """SEMDEDUP_THRESHOLD == NEARDUP_THRESHOLD, so every semantic
    drop pair must appear in the exact all-pairs near-dup baseline
    (cluster-scoping can only REMOVE pairs, never invent similarity):
    dedup_semantic ⊆ embedding_neardup_pairs as unordered pairs."""
    assert ann.SEMDEDUP_THRESHOLD == ann.NEARDUP_THRESHOLD
    sem = {
        (min(r.vec_id, r.dup_of), max(r.vec_id, r.dup_of))
        for r in ann.semantic_dedup(spark, sf_dir).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in ann.embedding_neardup_pairs(spark, sf_dir).collect()
    }
    assert sem, "fixture should contain semantic near-dups"
    assert sem <= exact, sorted(sem - exact)[:5]


def test_semantic_dedup_drops_later_doc_of_each_pair(spark, sf_dir):
    """Greedy keep-first-seen: the dropped doc is always the LATER id
    and a doc never names itself."""
    rows = ann.semantic_dedup(spark, sf_dir).collect()
    assert all(r.dup_of < r.vec_id for r in rows)


def test_corpus_mix_hits_target_shares(spark, sf_dir):
    """The mixing rates must actually move the distribution: for every
    non-saturated language (rate < 1) the achieved share of the kept
    corpus should be near its target share once rescaled by the total
    kept mass (the md5 sampler is deterministic, not exact — tolerance
    is 3 binomial sigmas on the kept count); saturated languages
    (rate == 1) keep everything they have."""
    rows = {r.lang: r for r in analysis.corpus_mix(spark, sf_dir).collect()}
    targets = dict(analysis.MIX_TARGETS)
    assert set(rows) == set(targets)
    total_kept = sum(r.n_kept for r in rows.values())
    assert total_kept > 0
    for lang, r in rows.items():
        if r.rate >= 1.0:
            assert r.n_kept == r.n_total, (lang, r)
            continue
        expect = r.n_total * r.rate
        sigma = max(1.0, (expect * (1 - r.rate)) ** 0.5)
        # 3 binomial sigmas around rate*n — the tightest distribution
        # claim that holds at sf0.01's ~30-70 rows per language (a
        # fixed relative tolerance is either vacuous at sf0.1 or flaky
        # here; the md5 sampler behaves binomially by construction).
        assert abs(r.n_kept - expect) <= 3 * sigma, (lang, r, expect)


def test_text_repetition_flags_are_consistent_with_ratios(spark, sf_dir):
    """The verdict column is exactly the documented predicate over the
    emitted ratio columns (no hidden inputs), and a healthy natural
    corpus is mostly non-repetitive."""
    rows = analysis.text_repetition(spark, sf_dir).collect()
    assert rows
    n_flagged = 0
    for r in rows:
        expected = bool(
            (r.dup_token_frac or 0) > analysis.REPETITION_DUP_TOKEN_MAX
            or (r.top_token_frac or 0) > analysis.REPETITION_TOP_TOKEN_MAX
            or (r.top_bigram_frac or 0) > analysis.REPETITION_TOP_BIGRAM_MAX
        )
        assert r.repetitive == expected, r
        n_flagged += r.repetitive
    assert n_flagged < len(rows) * 0.5


def test_semantic_dedup_vectorized_assign_matches_expression(spark, sf_dir):
    """The Arrow/numpy matmul assignment (the registered default) must
    reproduce the expression-path drop-list exactly — both round the
    centroid cosine to 6dp before ranking and break ties toward the
    lowest centroid id, so a mismatch here means an implementation
    bug, not a tie."""
    expr_rows = sorted(
        map(
            tuple,
            ann.semantic_dedup(
                spark, sf_dir, vectorized_assign=False
            ).collect(),
        )
    )
    vec_rows = sorted(
        map(
            tuple,
            ann.semantic_dedup(
                spark, sf_dir, vectorized_assign=True
            ).collect(),
        )
    )
    assert expr_rows == vec_rows and len(expr_rows) > 0


def test_mix_temperature_oracle_parity(spark, sf_dir):
    from .oracle_utils import assert_matches_oracle

    assert_matches_oracle(
        analysis.corpus_mix_temperature(spark, sf_dir),
        analysis.STAGED_ORACLES["corpus_mix_temperature"],
        sf_dir,
    )


def test_mix_temperature_flattens_toward_uniform(spark, sf_dir):
    """α < 1 must shrink the head domain's share and grow every tail
    domain's (the entire point of temperature sampling), shares must
    renormalize to 1, and the sampled budget must conserve the corpus
    size up to per-domain rounding."""
    rows = analysis.corpus_mix_temperature(spark, sf_dir).collect()
    assert len(rows) >= 2
    head = max(rows, key=lambda r: r.share)
    # head shrink is fixture-pinned (it holds whenever the head is
    # clearly above uniform, as in the en-heavy fixture); the tail
    # assertion below is the UNIVERSAL guarantee — any domain
    # strictly below the uniform share 1/n gains under α < 1
    # (p^(α-1) > n^(1-α) ≥ Σ p_j^α by Jensen).
    assert head.temp_share < head.share and head.boost < 1.0
    uniform = 1.0 / len(rows)
    for r in rows:
        if r.share < uniform:
            assert r.temp_share > r.share and r.boost > 1.0, r
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    n = sum(r.n_docs for r in rows)
    assert abs(sum(r.n_sampled for r in rows) - n) <= len(rows)
    # ordering preserved: temperature flattens, it never reranks
    by_share = sorted(rows, key=lambda r: r.share)
    assert by_share == sorted(rows, key=lambda r: r.temp_share)


def test_text_repetition_standalone_oracle_parity(spark, sf_dir):
    """Driver-rigor oracle parity for text_repetition at the MODULE
    level — the prerequisite for the queued r13 retirement (ROADMAP:
    text_repetition -> corpus_keep_decision, whose Spark plan calls
    this fn as its repetition gate and whose oracle nests this SQL as
    a CTE; the lsh_verified r12 precedent keeps standalone parity
    pinned here regardless of the registry row)."""
    from .oracle_utils import assert_matches_oracle

    assert_matches_oracle(
        analysis.text_repetition(spark, sf_dir),
        analysis.ORACLES["text_repetition"],
        sf_dir,
    )


def test_text_logprob_standalone_oracle_parity(spark, sf_dir):
    """Driver-rigor oracle parity for text_logprob at the MODULE
    level — the r13 retirement pin (text_logprob ->
    corpus_keep_decision, whose Spark plan calls this fn as its
    LM-band gate and whose oracle nests this SQL as the `nll` CTE;
    same discipline as the text_repetition pin above)."""
    from .oracle_utils import assert_matches_oracle

    assert_matches_oracle(
        analysis.text_logprob(spark, sf_dir),
        analysis.ORACLES["text_logprob"],
        sf_dir,
    )


def test_mix_doremi_oracle_parity(spark, sf_dir):
    """Driver-rigor oracle parity for the DoReMi EG step (staged
    r13)."""
    from .oracle_utils import assert_matches_oracle

    assert_matches_oracle(
        analysis.corpus_mix_doremi(spark, sf_dir),
        analysis.STAGED_ORACLES["corpus_mix_doremi"],
        sf_dir,
    )


def test_mix_doremi_upweights_hard_domains(spark, sf_dir):
    """The point of the update: domains whose bigram-LM loss exceeds
    the corpus mean must gain weight relative to their observed share
    (boost > smoothing-only baseline) and easy domains must lose it;
    weights stay a distribution; ordering by excess loss is the
    ordering by boost."""
    rows = analysis.corpus_mix_doremi(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    scored = [r for r in rows if r.mean_loss is not None]
    assert len(scored) >= 2

    # invert the uniform smoothing to recover the pure EG ratio
    # w_norm/share (the smoothing term c/k deliberately boosts
    # small-share domains regardless of loss, so the monotonicity
    # claim lives on the UNSMOOTHED update)
    c, k = analysis.DOREMI_SMOOTH, len(rows)

    def eg_boost(r):
        return (r.weight - c / k) / ((1.0 - c) * r.share)

    mean_loss = sum(r.mean_loss * r.n_docs for r in scored) / sum(
        r.n_docs for r in scored
    )
    for r in scored:
        if r.mean_loss > mean_loss + 0.05:
            assert eg_boost(r) > 1.0, r
        if r.mean_loss < mean_loss - 0.05:
            assert eg_boost(r) < 1.0, r
    by_loss = sorted(scored, key=lambda r: r.mean_loss)
    assert by_loss == sorted(scored, key=eg_boost), (
        "EG must preserve the loss ordering in the unsmoothed boosts"
    )


def test_mix_doremi_floor_survives_extreme_skew(spark, tmp_path):
    """ADVICE r13 #4: a tiny-share domain with strongly negative
    excess loss rounds e6 = round(sh·exp(η·excess), 6) to 0.0;
    without the greatest(e6, 1e-6) floor its pure-EG weight
    vanishes (and if EVERY domain rounded to 0, w_norm's divide
    would go 0/0 → NULL and the whole mix would silently collapse).
    Constructed corpus: 2,000 hard two-token docs in 'xx'
    (p = 1/2000 per pair, NLL ≈ 7.6) and ONE trivially easy doc in
    'yy' (sh ≈ 5e-4, excess ≈ −7.6 → unfloored e6 rounds to 0).
    The floor must keep 'yy' a positive EG weight STRICTLY above the
    smoothing-only c/k baseline at the 6dp grid, weights must stay a
    distribution, and cross-engine parity must hold on this corpus
    (both engines floor identically)."""
    import os
    import shutil

    from customer_churn_prediction_spark.catalog import TABLES

    from .conftest import SF_SMOKE
    from .oracle_utils import assert_matches_oracle

    rows = [(i, "z u%d" % i, "xx", "s", 10) for i in range(2000)]
    rows.append((2000, " ".join(["a"] * 50), "yy", "s", 99))
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    path = str(tmp_path)
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(path, f"{t}.parquet"))
    staging = f"{path}/_staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    shutil.move(
        os.path.join(staging, part), f"{path}/documents.parquet"
    )
    shutil.rmtree(staging)

    out = {r.lang: r for r in
           analysis.corpus_mix_doremi(spark, path).collect()}
    assert set(out) == {"xx", "yy"}
    # the skew actually bites: yy's share is tiny and its loss far
    # below the corpus mean (the unfloored e6 would round to 0)
    assert out["yy"].share < 1e-3
    assert out["yy"].mean_loss < out["xx"].mean_loss - 7.0
    # floor keeps the EG term alive: weight strictly above the
    # smoothing-only baseline c/k at the 6dp grid (unfloored it
    # would be exactly round(c/k, 6))
    c, k = analysis.DOREMI_SMOOTH, 2
    assert out["yy"].weight > round(c / k, 6)
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-4
    assert all(r.weight is not None for r in out.values())

    assert_matches_oracle(
        analysis.corpus_mix_doremi(spark, path),
        analysis.STAGED_ORACLES["corpus_mix_doremi"],
        path,
    )
