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
