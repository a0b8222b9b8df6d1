"""dq_audit (operators/quality.py) — staged registry candidate; oracle
parity at driver rigor plus violation detection on constructed dirty
inputs (the fixtures are clean, so detection must be proven
separately)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import quality

from .oracle_utils import assert_matches_oracle


def test_dq_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        quality.dq_audit(spark, sf_dir), quality.DQ_ORACLE, sf_dir
    )


def test_fixture_tables_pass_every_rule(spark, sf_dir):
    rows = quality.dq_audit(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.passed == 1 for r in rows)
    assert all(r.n_violations == 0 for r in rows)
    assert all(r.n_rows > 0 for r in rows)


def test_dirty_data_is_detected(spark, sf_dir, tmp_path):
    """Copy sf tables into a scratch dir, inject one violation per rule
    class, and assert the audit counts exactly them."""
    src = sf_dir
    out = str(tmp_path / "dirty")
    for t in ("customer", "part", "supplier", "region", "nation",
              "embeddings"):
        spark.read.parquet(f"{src}/{t}.parquet").write.parquet(
            f"{out}/{t}.parquet"
        )
    orders = spark.read.parquet(f"{src}/orders.parquet")
    first = orders.limit(1)
    dirty_orders = (
        orders
        # duplicate one PK
        .unionByName(first)
        # one orphan o_custkey and one non-positive price
        .unionByName(
            first.select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                F.lit(-1).cast("long").alias("o_custkey"),
                "o_orderstatus",
                F.lit(-5.0).alias("o_totalprice"),
                "o_orderdate",
                "o_orderpriority",
            )
        )
    )
    dirty_orders.write.parquet(f"{out}/orders.parquet")
    lineitem = spark.read.parquet(f"{src}/lineitem.parquet")
    lineitem.limit(1).select(
        F.lit(999_999_999).cast("long").alias("l_orderkey"),
        *[c for c in lineitem.columns if c != "l_orderkey"],
    ).unionByName(lineitem.select("l_orderkey", *[
        c for c in lineitem.columns if c != "l_orderkey"
    ])).write.parquet(f"{out}/lineitem.parquet")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    docs.unionByName(
        spark.createDataFrame(
            [(10_000_001, None, "en", "srcX", 5),
             (10_000_002, "abc", "en", "srcX", 99)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    ).write.parquet(f"{out}/documents.parquet")
    events = spark.read.parquet(f"{src}/events.parquet")
    events.unionByName(
        spark.createDataFrame(
            [(20_000_001, dt.datetime(2024, 1, 1), 1, "bogus_type", -3.0,
              "{}")],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
    ).write.parquet(f"{out}/events.parquet")

    got = {r.check: r for r in quality.dq_audit(spark, out).collect()}
    assert got["pk_unique_o_orderkey"].n_violations == 1
    assert got["o_totalprice_positive"].n_violations == 1
    assert got["fk_orders_customer"].n_violations == 1
    assert got["fk_lineitem_orders"].n_violations == 1
    assert got["text_not_null"].n_violations == 1
    assert got["n_chars_matches_text"].n_violations == 1
    assert got["event_type_in_domain"].n_violations == 1
    assert got["value_non_negative"].n_violations == 1
    assert all(
        got[c].passed == 0
        for c in (
            "pk_unique_o_orderkey", "o_totalprice_positive",
            "fk_orders_customer", "fk_lineitem_orders", "text_not_null",
            "n_chars_matches_text", "event_type_in_domain",
            "value_non_negative",
        )
    )
    # untouched rules still pass
    assert got["o_orderdate_not_null"].passed == 1
    assert got["pk_unique_doc_id"].passed == 1


def test_dimension_fk_check_broadcasts(spark, sf_dir):
    """The customer-side anti-join must plan as a broadcast (dimension
    build side), never a shuffle of the fact table."""
    plan = (
        quality.dq_audit(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
