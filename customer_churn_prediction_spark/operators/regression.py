"""In-database regression: per-brand discount elasticity of demand.

Does a deeper discount move more units? Closed-form simple OLS of
quantity on discount, grouped by brand — the classic retail
price-sensitivity screen, computed entirely as ONE conditional
aggregation (no ML library, no iterative fit): slope, intercept, and
R² all derive from the five sufficient statistics
(n, Σx, Σy, Σxy, Σx², Σy²) of each group.

Scale shape: a single map-side-combined hash aggregate over the fact
join — sufficient statistics are the textbook distributable form of
linear regression (they merge associatively across any partitioning),
so the plan is identical at 100 TB. Determinism for the oracle hash:
the discount is rescaled to an INTEGER percent (values are exact
hundredths; ``round(l_discount*100)``) and quantity is integral, so
every Σ is exact 64-bit integer arithmetic in both engines — the
float math (slope/R² derivation) then has a fixed operand order over
identical integers and rounds identically, where summing raw-double
products would drift by partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

MIN_ROWS = 30  # below this a brand's fit is noise; emit nothing


def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of quantity on discount-percent.

    ``slope`` is units per discount POINT (1% deeper discount ⇒ slope
    more units); ``r2`` grades how much of the quantity variance the
    discount explains."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    # The sufficient statistics stay exact integers; the DERIVED
    # quantities go through double before any product of two large
    # terms — num², den_x·den_y overflow int64 already at sf0.01 and
    # Spark's long multiply wraps SILENTLY (DuckDB's raises). The
    # statistics themselves fit comfortably (≲1e10 at sf0.1); a
    # 100 TB deployment with ~1e9 rows per group moves them to
    # DECIMAL(38) — the same plan, wider sums.
    den_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    numd = num.cast("double")
    slope = numd / den_x
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (numd * numd) / (den_x.cast("double") * den_y.cast("double"))
    return (
        stats.where((n >= MIN_ROWS) & (den_x > 0) & (den_y > 0))
        .select(
            "p_brand",
            "n",
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


ELASTICITY_ORACLE = f"""
WITH pts AS (
  SELECT p.p_brand,
         CAST(round(l.l_discount * 100) AS BIGINT) AS x,
         CAST(l.l_quantity AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
stats AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY 1
)
SELECT p_brand, n,
  round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) AS slope,
  round((sy - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * sx)
        / n, 6) AS intercept,
  round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        / (CAST(n * sxx - sx * sx AS DOUBLE)
           * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM stats
WHERE n >= {MIN_ROWS} AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY p_brand
"""

# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_regression.py holds
# them to driver rigor regardless.
QUERIES = {"brand_price_elasticity": brand_price_elasticity}
ORACLES = {"brand_price_elasticity": ELASTICITY_ORACLE}
