"""Scans, filters, predicates, sorts, limits, set operations.

Covers SURVEY.md §2.2 (P1-P9), §2.6 (O1-O3 + the set ops the
reference lacks but Spark provides), and the HAVING / IN-list
predicates (P6, P7). Every predicate compares raw columns against
literals so it pushes down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1/P4/P5: projection + equality & date-range predicates.

    Reference shape: RF/randomforest_churn.scala:43-45 (SQL scan with
    to_date BETWEEN) and :83 (inequality filter).
    """
    return (
        _feat_orders(spark, sf_dir)
        .where(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


def having_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (RF/randomforest_churn.scala:90-92): agg + filter-on-aggregate
    == SQL HAVING; customers who purchased on more than one day."""
    return (
        _feat_orders(spark, sf_dir)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.countDistinct(F.to_date("o_orderdate")).alias("purchase_days"))
        .filter(F.col("purchase_days") > 1)
    )


def isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (RF/randomforest_churn.scala:134): IN-list membership."""
    return (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size").isin(1, 5, 10, 15))
        .where(F.col("p_type").isin("PROMO", "ECONOMY"))
        .select("p_partkey", "p_name", "p_type", "p_size")
    )


def na_fill_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (RF/randomforest_churn.scala:180,200): typed na.fill after an
    outer join — strings -> 'unknow', numerics -> 0, in that order."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    agg = (
        _feat_orders(spark, sf_dir)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderpriority").alias("last_priority"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )
    return customer.join(agg, "c_custkey", "left").na.fill("unknow").na.fill(0)


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tie-break (sort + limit)."""
    return (
        _feat_orders(spark, sf_dir)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def set_ops_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over PROMO- vs ECONOMY-part buyers."""
    orders = _feat_orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    detail = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)

    def buyers(ptype: str) -> DataFrame:
        return (
            detail.where(F.col("p_type") == ptype)
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    promo, economy = buyers("PROMO"), buyers("ECONOMY")
    return (
        promo.intersect(economy).withColumn("tag", F.lit("both"))
        .unionAll(promo.subtract(economy).withColumn("tag", F.lit("promo_only")))
        .unionAll(economy.subtract(promo).withColumn("tag", F.lit("economy_only")))
    )


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (RF/randomforest_churn.scala:72): projection + distinct."""
    return (
        _feat_orders(spark, sf_dir)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderpriority")
        .distinct()
    )


_SALT_BUCKETS = 8


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: salted equi-join. The fact side gets a
    deterministic salt from its join key (crc32 % B); the dimension
    side is exploded B-fold so every (key, salt) pair exists; the join
    runs on the composite key, splitting a hot key's rows across B
    reducers. The result is provably identical to the plain join
    (oracle = unsalted SQL); AQE's skew-join split is the automatic
    alternative, but explicit salting also fixes skewed AGGREGATIONS
    and pre-AQE engines, so the engine exposes it as an operator."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    salted_fact = orders.withColumn(
        "salt", F.crc32(F.col("o_custkey").cast("string")) % _SALT_BUCKETS
    )
    salted_dim = customer.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_BUCKETS)]))
    ).withColumn("salt", F.col("salt").cast("long"))
    joined = salted_fact.join(
        salted_dim,
        (salted_fact.o_custkey == salted_dim.c_custkey)
        & (salted_fact.salt == salted_dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def sampled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O4 sampling surface (rows-only: per-partition Bernoulli
    draws are engine-specific, so no SQL oracle): seeded uniform
    sample and seeded stratified sampleBy, reported as per-status
    counts next to the exact totals. Both are single-pass map-side
    filters — no shuffle beyond the final tiny aggregate."""
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus")
    uniform = o.sample(fraction=0.1, seed=42)
    strata = {"F": 0.05, "O": 0.2, "P": 0.5}
    stratified = o.sampleBy("o_orderstatus", strata, seed=42)
    exact = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    u = uniform.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_uniform_10pct")
    )
    s = stratified.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_stratified")
    )
    return exact.join(u, "o_orderstatus", "left").join(
        s, "o_orderstatus", "left"
    ).na.fill(0)


_BUYERS_CTE = f"""
detail AS (
  SELECT o.o_custkey, p.p_type
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE {_WINDOW_PRED_SQL}
),
promo AS (SELECT DISTINCT o_custkey AS c_custkey FROM detail WHERE p_type = 'PROMO'),
economy AS (SELECT DISTINCT o_custkey AS c_custkey FROM detail WHERE p_type = 'ECONOMY')
"""

QUERIES = {
    "scan_filter_project": scan_filter_project,
    "having_repurchase": having_repurchase,
    "isin_filter": isin_filter,
    "na_fill_left_join": na_fill_left_join,
    "topk_orders": topk_orders,
    "set_ops_buyers": set_ops_buyers,
    "distinct_pairs": distinct_pairs,
    "salted_join_revenue": salted_join_revenue,
    "sampled_orders": sampled_orders,  # rows-only (engine-specific RNG)
}

ORACLES = {
    "scan_filter_project": f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date
FROM orders WHERE {_WINDOW_PRED_SQL} AND o_orderstatus = 'F'
""",
    "having_repurchase": f"""
SELECT o_custkey AS c_custkey,
       count(DISTINCT CAST(o_orderdate AS DATE)) AS purchase_days
FROM orders WHERE {_WINDOW_PRED_SQL}
GROUP BY o_custkey HAVING count(DISTINCT CAST(o_orderdate AS DATE)) > 1
""",
    "isin_filter": """
SELECT p_partkey, p_name, p_type, p_size FROM part
WHERE p_size IN (1, 5, 10, 15) AND p_type IN ('PROMO', 'ECONOMY')
""",
    "na_fill_left_join": f"""
SELECT c.c_custkey,
       COALESCE(a.last_priority, 'unknow') AS last_priority,
       COALESCE(a.order_cnt, 0) AS order_cnt
FROM customer c
LEFT JOIN (
  SELECT o_custkey AS c_custkey, max(o_orderpriority) AS last_priority,
         count(*) AS order_cnt
  FROM orders WHERE {_WINDOW_PRED_SQL} GROUP BY o_custkey
) a USING (c_custkey)
""",
    "topk_orders": f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE {_WINDOW_PRED_SQL}
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    "set_ops_buyers": f"""
WITH {_BUYERS_CTE}
SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM promo INTERSECT SELECT * FROM economy)
UNION ALL
SELECT c_custkey, 'promo_only' AS tag FROM (SELECT * FROM promo EXCEPT SELECT * FROM economy)
UNION ALL
SELECT c_custkey, 'economy_only' AS tag FROM (SELECT * FROM economy EXCEPT SELECT * FROM promo)
""",
    "distinct_pairs": f"""
SELECT DISTINCT o_custkey AS c_custkey, o_orderpriority
FROM orders WHERE {_WINDOW_PRED_SQL}
""",
    # The salted join must equal the PLAIN join — that's the point.
    "salted_join_revenue": """
SELECT c.c_mktsegment, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
}
