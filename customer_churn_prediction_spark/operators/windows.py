"""Window-function operators (SURVEY.md §2.5, W1-W5 + extensions).

The reference only uses unbounded-partition windows (no ORDER BY) —
covered by ``rfm.rfm_window``. Here we add the ranking/analytic
extensions SURVEY flags as free in Spark: row_number dedup (the
natural form of the reference's window+distinct idiom), lag-based
purchase gaps, and an ordered running-total frame.

Ordering ties are always broken by a unique key so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..constants import FEAT_END_EXCL, FEAT_START

_WINDOW_PRED_SQL = (
    f"o_orderdate >= TIMESTAMP '{FEAT_START}' "
    f"AND o_orderdate < TIMESTAMP '{FEAT_END_EXCL}'"
)


def _feat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(FEAT_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(FEAT_END_EXCL).cast("timestamp"))
    )


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() = 1 dedup — the scalable rewrite of the reference's
    window+distinct idiom (RF/randomforest_churn.scala:61-72)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        _feat_orders(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_date"),
            "o_totalprice",
        )
    )


def purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytics: per-customer average days between consecutive
    orders (avg of ints => IEEE-deterministic double)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = _feat_orders(spark, sf_dir).withColumn(
        "gap_days",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ),
    )
    return (
        gaps.where(F.col("gap_days").isNotNull())
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.avg("gap_days").alias("avg_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            F.count(F.lit(1)).alias("n_gaps"),
        )
    )


def running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered cumulative frame (rows unbounded preceding .. current);
    2dp rounding pins the running double sum to its decimal grid."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _feat_orders(spark, sf_dir).select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("long").alias("order_seq"),  # long: parity with DuckDB row_number
    )


QUERIES = {
    "latest_order_per_customer": latest_order_per_customer,
    "purchase_gaps": purchase_gaps,
    "running_spend": running_spend,
}

ORACLES = {
    "latest_order_per_customer": f"""
SELECT o_custkey AS c_custkey, o_orderkey AS last_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS last_order_date,
       o_totalprice
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders WHERE {_WINDOW_PRED_SQL}
) WHERE rn = 1
""",
    "purchase_gaps": f"""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
           CAST(lag(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders WHERE {_WINDOW_PRED_SQL}
)
SELECT o_custkey AS c_custkey,
       avg(gap_days) AS avg_gap_days,
       CAST(max(gap_days) AS INTEGER) AS max_gap_days,
       count(*) AS n_gaps
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY o_custkey
""",
    "running_spend": f"""
SELECT o_custkey AS c_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       row_number() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders WHERE {_WINDOW_PRED_SQL}
""",
}
