"""Data-quality audit over the star schema (deequ/DQ-rule style).

A 100 TB warehouse runs constraint checks BEFORE the analytics tiers
consume the data: key uniqueness, referential integrity, domain and
range rules, derived-column consistency. This operator evaluates a
fixed rule catalog and emits one row per rule — the report a data
platform alerts on — with the violation count, total rows, and a
pass flag.

Scale shape:

* **Single-table rules share one scan per table.** All of a table's
  conditional violation counts come from ONE aggregate over one scan
  (a sum of CASE per rule), then ``stack`` unpivots the single
  wide row into (check, n_violations) rows — per-rule passes over a
  100 TB fact table would multiply the scan cost by the rule count.
* **Referential rules are anti-join counts.** Orphan detection is a
  LEFT ANTI join against the parent's distinct keys — broadcast when
  the parent is a dimension (customer), shuffle when both sides are
  facts (lineitem→orders; inherent to FK checking at scale, and the
  distinct-key build side is the smaller projection, never the full
  row). Each anti-join then aggregates to a single count, so nothing
  but the counts crosses stages.
* The final report is a union of tiny 1-to-6-row frames — driver-side
  cost is zero, and every heavy input participates in exactly one
  aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def unpivot_counts(agg_row: DataFrame, checks: list[str]) -> DataFrame:
    """Wide one-row rule-counter frame -> (check, n_violations, n_rows)
    — the ONE unpivot both the batch audit and the streaming monitor
    (streaming/quality.py) use, so their report shapes cannot drift."""
    stack_args = ", ".join(f"'{c}', {c}" for c in checks)
    return agg_row.select(
        F.expr(
            f"stack({len(checks)}, {stack_args}) as (check, n_violations)"
        ),
        F.col("_n_rows").alias("n_rows"),
    )


def finish_report(unpivoted: DataFrame) -> DataFrame:
    """Shared final projection: typed counts + the passed flag."""
    return unpivoted.select(
        "check",
        *[c for c in unpivoted.columns if c not in ("check", "n_violations",
                                                    "n_rows")],
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def _unpivot_checks(
    agg_row: DataFrame, table: str, checks: list[str]
) -> DataFrame:
    return unpivot_counts(agg_row, checks).select(
        "check",
        "n_violations",
        F.lit(table).alias("table_name"),
        "n_rows",
    )


def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the rule catalog; one report row per rule."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    documents = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    # --- single-scan conditional rule blocks -------------------------
    orders_agg = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "pk_unique_o_orderkey"
        ),
        viol(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("o_totalprice_positive"),
        viol(F.col("o_orderdate").isNull()).alias("o_orderdate_not_null"),
        F.count(F.lit(1)).alias("_n_rows"),
    )
    docs_agg = documents.agg(
        viol(F.col("text").isNull()).alias("text_not_null"),
        viol(
            F.col("text").isNotNull()
            & (F.col("n_chars") != F.length("text"))
        ).alias("n_chars_matches_text"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("doc_id"))).alias(
            "pk_unique_doc_id"
        ),
        F.count(F.lit(1)).alias("_n_rows"),
    )
    events_agg = events.agg(
        viol(~F.col("event_type").isin(*EVENT_TYPES)).alias(
            "event_type_in_domain"
        ),
        viol(F.col("value") < 0).alias("value_non_negative"),
        F.count(F.lit(1)).alias("_n_rows"),
    )

    # --- referential rules (anti-join counts) ------------------------
    orphan_orders = (
        orders.select("o_custkey")
        .join(
            F.broadcast(customer.select("c_custkey").distinct()),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("fk_orders_customer").alias("check"),
            "n_violations",
            F.lit("orders").alias("table_name"),
        )
    )
    orphan_lineitem = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("fk_lineitem_orders").alias("check"),
            "n_violations",
            F.lit("lineitem").alias("table_name"),
        )
    )
    n_orders = orders_agg.select(F.col("_n_rows"))
    n_line = lineitem.agg(F.count(F.lit(1)).alias("_n_rows"))
    fk_rows = orphan_orders.crossJoin(n_orders).unionByName(
        orphan_lineitem.crossJoin(n_line)
    ).select("check", "n_violations", "table_name", F.col("_n_rows").alias("n_rows"))

    report = (
        _unpivot_checks(
            orders_agg,
            "orders",
            [
                "pk_unique_o_orderkey",
                "o_totalprice_positive",
                "o_orderdate_not_null",
            ],
        )
        .unionByName(
            _unpivot_checks(
                docs_agg,
                "documents",
                ["text_not_null", "n_chars_matches_text", "pk_unique_doc_id"],
            )
        )
        .unionByName(
            _unpivot_checks(
                events_agg, "events", ["event_type_in_domain", "value_non_negative"]
            )
        )
        .select("check", "n_violations", "table_name", "n_rows")
        .unionByName(fk_rows)
    )
    return finish_report(report).orderBy("table_name", "check")


_EVENT_LIST = ", ".join(f"'{e}'" for e in EVENT_TYPES)

DQ_ORACLE = f"""
WITH o AS (
  SELECT
    count(*) - count(DISTINCT o_orderkey) AS pk_unique_o_orderkey,
    count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0)
      AS o_totalprice_positive,
    count(*) FILTER (WHERE o_orderdate IS NULL) AS o_orderdate_not_null,
    count(*) AS _n_rows
  FROM orders
), d AS (
  SELECT
    count(*) FILTER (WHERE text IS NULL) AS text_not_null,
    count(*) FILTER (WHERE text IS NOT NULL AND n_chars <> length(text))
      AS n_chars_matches_text,
    count(*) - count(DISTINCT doc_id) AS pk_unique_doc_id,
    count(*) AS _n_rows
  FROM documents
), e AS (
  SELECT
    count(*) FILTER (WHERE event_type NOT IN ({_EVENT_LIST}))
      AS event_type_in_domain,
    count(*) FILTER (WHERE value < 0) AS value_non_negative,
    count(*) AS _n_rows
  FROM events
), rows_out AS (
  SELECT 'pk_unique_o_orderkey' AS check, 'orders' AS table_name,
         pk_unique_o_orderkey AS n_violations, _n_rows AS n_rows FROM o
  UNION ALL SELECT 'o_totalprice_positive', 'orders', o_totalprice_positive,
                   _n_rows FROM o
  UNION ALL SELECT 'o_orderdate_not_null', 'orders', o_orderdate_not_null,
                   _n_rows FROM o
  UNION ALL SELECT 'text_not_null', 'documents', text_not_null, _n_rows FROM d
  UNION ALL SELECT 'n_chars_matches_text', 'documents', n_chars_matches_text,
                   _n_rows FROM d
  UNION ALL SELECT 'pk_unique_doc_id', 'documents', pk_unique_doc_id,
                   _n_rows FROM d
  UNION ALL SELECT 'event_type_in_domain', 'events', event_type_in_domain,
                   _n_rows FROM e
  UNION ALL SELECT 'value_non_negative', 'events', value_non_negative,
                   _n_rows FROM e
  UNION ALL SELECT 'fk_orders_customer', 'orders',
    (SELECT count(*) FROM orders o2 LEFT JOIN
       (SELECT DISTINCT c_custkey FROM customer) c
       ON o2.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
    (SELECT count(*) FROM orders)
  UNION ALL SELECT 'fk_lineitem_orders', 'lineitem',
    (SELECT count(*) FROM lineitem l LEFT JOIN
       (SELECT DISTINCT o_orderkey FROM orders) o3
       ON l.l_orderkey = o3.o_orderkey WHERE o3.o_orderkey IS NULL),
    (SELECT count(*) FROM lineitem)
)
SELECT "check", table_name,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS passed
FROM rows_out
ORDER BY table_name, "check"
"""

# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_quality_audit.py holds
# them to driver rigor regardless.
QUERIES = {"dq_audit": dq_audit}
ORACLES = {"dq_audit": DQ_ORACLE}
