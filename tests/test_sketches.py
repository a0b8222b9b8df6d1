"""approx_percentile_bands (operators/sketches.py) — staged registry
candidate; oracle parity at driver rigor plus the error-contract
semantics on adversarial inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sketches

from .oracle_utils import assert_matches_oracle


def test_sketch_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        sketches.approx_percentile_bands(spark, sf_dir),
        sketches.APPROX_PERCENTILE_ORACLE,
        sf_dir,
    )


def test_bands_hold_on_fixture(spark, sf_dir):
    rows = sketches.approx_percentile_bands(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.in_band_p50 and r.in_band_p95
        assert r.exact_p50 <= r.exact_p95


def test_band_detects_a_broken_sketch(spark, sf_dir):
    """The contract must be falsifiable: a deliberately wrong 'sketch'
    value lands outside the band on skewed data. Reuses the operator's
    band arithmetic against a value one band-width off."""
    li = spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    agg = li.agg(
        F.percentile("v", 0.5).alias("exact"),
        F.percentile("v", 0.5 - 2 * sketches._EPS).alias("lo"),
        F.percentile("v", 0.5 + 2 * sketches._EPS).alias("hi"),
    ).collect()[0]
    fake = agg.exact + (agg.hi - agg.lo) + 1.0
    assert not (agg.lo <= fake <= agg.hi)


def test_single_aggregate_no_second_scan(spark, sf_dir):
    """Sketch + exact percentiles + band bounds must share ONE
    aggregation pass over ONE scan."""
    df = sketches.approx_percentile_bands(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_cms_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        sketches.heavy_hitters_cms(spark, sf_dir),
        sketches.HEAVY_HITTERS_ORACLE,
        sf_dir,
    )


def test_cms_verdicts_hold_on_fixture(spark, sf_dir):
    rows = sketches.heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) == sketches.CMS_TOPK
    for r in rows:
        assert r.no_undercount and r.within_band


def _cms_estimates(df, key_frame):
    """Sketch-only estimate path (no exact counts): what a production
    skew probe would run. ``df``/``key_frame`` carry a ``key`` col."""
    from pyspark.sql import functions as F

    sketch = (
        df.select(sketches._cms_cells(F.col("key")).alias("cell"))
        .select("cell.h", "cell.b")
        .groupBy("h", "b")
        .agg(F.count("*").alias("cell_cnt"))
    )
    return (
        key_frame.select(
            "key", sketches._cms_cells(F.col("key")).alias("cell")
        )
        .select("key", "cell.h", "cell.b")
        .join(F.broadcast(sketch), ["h", "b"])
        .groupBy("key")
        .agg(F.min("cell_cnt").alias("est"))
    )


def test_cms_total_reuses_exact_exchange_at_runtime(spark, sf_dir):
    """The 'N from the exact aggregate, not a third scan' claim in
    heavy_hitters_cms must hold in the EXECUTED adaptive plan: the
    n_total branch rides a ReusedExchange of the exact per-key
    aggregate (leaving exactly two parquet scans — sketch build and
    exact counts), and the sketch reaches the estimate join as a
    broadcast."""
    df = sketches.heavy_hitters_cms(spark, sf_dir)
    df.collect()  # drive to completion so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "ReusedExchange" in plan, (
        "n_total no longer reuses the exact aggregate's exchange — "
        "the events table is being scanned a third time:\n" + plan
    )
    assert "BroadcastHashJoin" in plan, plan


def test_cms_detects_an_injected_hot_key(spark):
    """Detection must be real: on a constructed stream — 1000 uniform
    background keys plus one key owning 2000 events — the SKETCH ALONE
    (no exact pass) separates the hot key from the background by more
    than the advertised error band."""
    background = spark.range(8_000).select(
        (F.col("id") % 1000).alias("key")
    )
    hot = spark.range(2_000).select(
        F.lit(77_777).cast("bigint").alias("key")
    )
    ev = background.unionByName(hot)
    n_total = 10_000
    band = sketches._E / sketches.CMS_WIDTH * n_total

    probes = spark.createDataFrame(
        [(77_777,), (3,)], "key bigint"
    )
    est = {r.key: r.est for r in _cms_estimates(ev, probes).collect()}
    # never undercounts; overcount within band
    assert 2_000 <= est[77_777] <= 2_000 + band
    assert 8 <= est[3] <= 8 + band
    # separable: the hot estimate clears the background even after
    # granting the background its worst-case overcount
    assert est[77_777] > est[3] + band


def test_hll_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sketches.distinct_users_hll(spark, sf_dir),
        sketches.HLL_ORACLE,
        sf_dir,
    )


def test_hll_verdict_holds_across_fixture_scales(spark):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        row = sketches.distinct_users_hll(spark, sf).collect()[0]
        assert row.within_band, (sf, row)


def test_hll_band_detects_a_broken_estimator(spark, sf_dir):
    """Negative control (the CMS broken-sketch pattern): an estimator
    off by 2x the band must flip the verdict — otherwise the boolean
    the oracle hash-checks proves nothing."""
    from customer_churn_prediction_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    regs = sketches.hll_registers(
        ev.select(F.col("user_id").alias("key"))
    )
    est = sketches.hll_estimate_expr(regs).select(
        (F.col("est") * (1 + 2 * sketches.HLL_BAND)).alias("est")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    row = exact.crossJoin(F.broadcast(est)).select(
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(sketches.HLL_BAND) * F.col("n_exact")
        ).alias("within_band")
    ).collect()[0]
    assert not row.within_band


def test_hll_registers_are_mergeable(spark, sf_dir):
    """max(registers(A), registers(B)) == registers(A union B) — the
    algebra the streaming twin relies on, asserted directly."""
    from customer_churn_prediction_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    ).select(F.col("user_id").alias("key"))
    a = ev.where(F.col("key") % 2 == 0)
    b = ev.where(F.col("key") % 2 != 0)
    merged = (
        sketches.hll_registers(a)
        .unionByName(sketches.hll_registers(b))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = sketches.hll_registers(ev)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_estimate_of_empty_register_frame_is_zero(spark):
    """Review r8: an empty registers frame (no keys yet) must estimate
    0 through linear counting (v_zero = m), not propagate a NULL sum
    into a NULL verdict."""
    empty = spark.createDataFrame([], "bucket int, max_rho int")
    row = sketches.hll_estimate_expr(empty).collect()[0]
    assert row.est == 0.0


def test_bloom_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sketches.bloom_buyer_membership(spark, sf_dir),
        sketches.BLOOM_ORACLE,
        sf_dir,
    )


def test_bloom_guarantees_hold_across_fixture_scales(spark):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        row = sketches.bloom_buyer_membership(spark, sf).collect()[0]
        assert row.n_false_negatives == 0, (sf, row)
        assert row.no_false_negatives
        assert row.fpr_within_band, (sf, row)
        # the probe set must contain true non-members or the FPR leg
        # is vacuous (the reason membership is feature-windowed)
        assert row.n_probed > row.n_members, (sf, row)
