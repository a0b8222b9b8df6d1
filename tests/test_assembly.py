from customer_churn_prediction_spark.operators import assembly

from .oracle_utils import assert_df_equal, assert_matches_oracle


def test_onepass_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        assembly.feature_assembly_onepass(spark, sf_dir),
        assembly.ASSEMBLY_ORACLE,
        sf_dir,
    )


def test_join_chain_equals_onepass(spark, sf_dir):
    assert_df_equal(
        assembly.feature_assembly(spark, sf_dir),
        assembly.feature_assembly_onepass(spark, sf_dir),
    )


def test_null_policy(spark, sf_dir):
    """Customers whose orders have no lineitems get numeric 0 / 'unknow'."""
    df = assembly.feature_assembly_onepass(spark, sf_dir)
    pdf = df.toPandas()
    assert pdf.notna().all().all(), "no nulls may survive the fill"
    assert set(pdf["shop_channel"].unique()) <= {
        "both", "urgent_only", "high_only", "unknow"
    }


def test_bucketed_flagship_equals_onepass(spark, sf_dir):
    assert_df_equal(
        assembly.feature_assembly_bucketed(spark, sf_dir),
        assembly.feature_assembly_onepass(spark, sf_dir),
    )


def test_bucketed_flagship_join_zero_exchange(spark, sf_smoke):
    """The at-rest layout's whole point: orders⋈lineitem (the flagship's
    one fact⋈fact shuffle) plans with NO Exchange from the bucketed
    tables, date filter included. Broadcast is disabled so the plan
    shows the sort-merge join a 100 TB run would use."""
    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.constants import (
        FEAT_END_EXCL,
        FEAT_START,
    )

    orders, lineitem = assembly.bucketed_ingest(spark, sf_smoke)
    orders = orders.where(
        (F.col("o_orderdate") >= F.lit(FEAT_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(FEAT_END_EXCL).cast("timestamp"))
    )
    joined = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select("o_custkey", "l_quantity")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
