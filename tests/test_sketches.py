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
