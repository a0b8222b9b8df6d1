"""brand_price_elasticity (operators/regression.py) — staged registry
candidate; oracle parity at driver rigor plus OLS correctness on a
constructed exact-fit line."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import regression

from .oracle_utils import assert_matches_oracle


def test_elasticity_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        regression.brand_price_elasticity(spark, sf_dir),
        regression.ELASTICITY_ORACLE,
        sf_dir,
    )


def test_exact_line_recovers_slope_and_r2_one(spark):
    """Points exactly on y = 3x + 7 (x = discount percent) must yield
    slope 3, intercept 7, r2 1 from the sufficient statistics."""
    rows = []
    for rep in range(10):
        for xp in range(0, 11):  # discount 0..10 percent
            rows.append((float(xp) / 100.0, float(3 * xp + 7)))
    li = spark.createDataFrame(rows, "l_discount double, l_quantity double")
    pts = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    num = s.n * s.sxy - s.sx * s.sy
    den_x = s.n * s.sxx - s.sx * s.sx
    den_y = s.n * s.syy - s.sy * s.sy
    assert num / den_x == 3.0
    assert (s.sy - (num / den_x) * s.sx) / s.n == 7.0
    assert (num * num) / (den_x * den_y) == 1.0


def test_single_aggregate_plan(spark, sf_dir):
    """One broadcast dim join, one hash aggregate — no window, no
    second scan of the fact table."""
    df = regression.brand_price_elasticity(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet ") == 2  # lineitem + part
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_outputs_are_sane(spark, sf_dir):
    rows = regression.brand_price_elasticity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n >= regression.MIN_ROWS
        assert 0.0 <= r.r2 <= 1.0
        # intercept ~ mean quantity at zero discount: positive, bounded
        assert 0.0 < r.intercept < 60.0
