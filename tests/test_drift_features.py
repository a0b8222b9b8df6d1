"""drift_psi_features (ml/drift_features.py) — staged registry
candidate; oracle parity at driver rigor plus the PSI semantics: a
same-distribution comparison scores ≈0 per feature, and the report is
one row per observed (feature, band)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.ml import drift_features, monitoring

from .oracle_utils import assert_matches_oracle


def test_drift_features_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        drift_features.drift_psi_features(spark, sf_dir),
        drift_features.DRIFT_FEATURES_ORACLE,
        sf_dir,
    )


def test_report_shape_and_replicated_totals(spark, sf_dir):
    rows = drift_features.drift_psi_features(spark, sf_dir).collect()
    feats = {r.feature for r in rows}
    assert feats == {"recency", "frequency", "monetary"}
    by_feat: dict[str, set] = {}
    for r in rows:
        by_feat.setdefault(r.feature, set()).add(r.psi_total)
        assert r.base_n >= 0 and r.curr_n >= 0
    for feat, totals in by_feat.items():
        assert len(totals) == 1, feat
        assert totals.pop() >= 0.0
    # the six-month shift is a real distribution move on this data:
    # frequency (six more months of orders per customer) must register
    # clear drift, while recency — anchored to each snapshot's own
    # as-of — stays comparatively stable
    total = {r.feature: r.psi_total for r in rows}
    assert total["frequency"] > 0.01
    assert total["recency"] < total["frequency"]


def test_identical_windows_score_near_zero(spark, sf_dir, monkeypatch):
    """Collapse the comparison to baseline-vs-baseline: every feature's
    PSI must be ~0 (only smoothing noise) — the property that makes
    the report trustworthy as an alarm."""
    from customer_churn_prediction_spark import constants

    monkeypatch.setattr(drift_features, "ASOF_CURR", constants.ASOF)
    monkeypatch.setattr(
        drift_features, "LABEL_END_EXCL", constants.FEAT_END_EXCL
    )
    rows = drift_features.drift_psi_features(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.psi_total) < 0.001, (r.feature, r.psi_total)


def test_one_scan_one_customer_aggregate(spark, sf_dir):
    df = drift_features.drift_psi_features(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet ") == 1
    assert "Join" not in plan


def test_shared_psi_core_is_the_same_function(spark):
    """The report must flow through monitoring.psi_from_counts — the
    shared-core discipline: a one-row histogram pair scores the exact
    PSI the formula gives by hand."""
    hist = spark.createDataFrame(
        [("f", 0, 90, 10), ("f", 1, 10, 90)],
        "feature string, bucket int, base_n long, curr_n long",
    )
    out = monitoring.psi_from_counts(
        hist, nbins=2, eps=0.0, with_fracs=False, by=("feature",)
    ).collect()
    import math

    want = (0.9 - 0.1) * math.log(0.9 / 0.1) * 2
    got = {r.psi_total for r in out}
    assert len(got) == 1
    assert abs(got.pop() - round(want, 6)) < 1e-9


def test_embedding_drift_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        drift_features.embedding_drift(spark, sf_dir),
        drift_features.ORACLES["embedding_drift"],
        sf_dir,
    )


def test_embedding_drift_detects_the_injected_reembedding(spark, sf_dir):
    """The abs() re-embedding must move cell occupancy decisively —
    psi_total far above the classic 0.25 'action' band (measured 1.4
    at sf0.001, 4.4 at sf0.01; it GROWS with n because the shift is
    systematic, unlike split noise). Both sides carry the full corpus
    and every report row replicates the same total."""
    rep = drift_features.embedding_drift(spark, sf_dir).collect()
    assert len(rep) >= 2  # baseline occupies >1 cell
    total = rep[0].psi_total
    assert all(r.psi_total == total for r in rep)  # replicated total
    assert total > 0.5
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.base_n for r in rep) == n_vec
    assert sum(r.curr_n for r in rep) == n_vec


def test_text_drift_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        drift_features.text_drift_psi(spark, sf_dir),
        drift_features.ORACLES["text_drift_psi"],
        sf_dir,
    )


def test_text_drift_null_floor_is_exactly_zero(spark, sf_dir,
                                               monkeypatch):
    """With the cipher set to identity the two sides are the SAME
    token stream, so every bucket's counts match and PSI is exactly
    0 — the same-population design borrowed from embedding_drift."""
    monkeypatch.setattr(drift_features, "_TD_TO", drift_features._TD_FROM)
    rep = drift_features.text_drift_psi(spark, sf_dir).collect()
    assert rep, "report must not be empty"
    for r in rep:
        assert r.base_n == r.curr_n
        assert r.psi_total == 0.0


def test_text_drift_detects_the_vocabulary_shift(spark, sf_dir):
    """The vowel-rotation cipher renames most of the (vowel-bearing)
    vocabulary, so the histogram moves decisively — far above the
    classic 0.25 action band (measured ~9.0 at both fixture SFs);
    totals replicate on every row and each side carries the full
    token count."""
    rep = drift_features.text_drift_psi(spark, sf_dir).collect()
    assert len(rep) >= 2
    total = rep[0].psi_total
    assert all(r.psi_total == total for r in rep)
    assert total > 1.0
    assert sum(r.base_n for r in rep) == sum(r.curr_n for r in rep)
