"""Source readers (S1-S6, S13).

The reference reads Hive tables via SQL strings (S1,
``RF/randomforest_churn.scala:43-55``), CSV with header+inferSchema
(S3, ``GBDT/spark/churn_xgb4j_spark.scala:19``), libsvm matrices (S5,
``FM/fm_libsvm/fm_churn_libsvm.py:75``), and JSON request records
(S13, ``GBDT/python/churn_xgb_server.py:13``). Parquet scans +
temp views subsume S1/S2 (see catalog.py); the rest are thin,
typed wrappers so the engine has one audited entry point per format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession, path: str, header: bool = True,
    infer_schema: bool = True, drop_null_rows: bool = False,
) -> DataFrame:
    """S3: csv with header + schema inference (+ the reference's
    ``na.drop()`` chained at the scan)."""
    df = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .csv(path)
    )
    return df.dropna() if drop_null_rows else df


def read_json_records(spark: SparkSession, path: str) -> DataFrame:
    """S13: newline-delimited JSON records (the serving payload shape)."""
    return spark.read.json(path)


def read_libsvm(
    spark: SparkSession, path: str, num_features: int | None = None
) -> DataFrame:
    """S5: libsvm matrix -> (label double, features SparseVector)."""
    reader = spark.read.format("libsvm")
    if num_features is not None:
        reader = reader.option("numFeatures", str(num_features))
    return reader.load(path)
