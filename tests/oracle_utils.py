"""Local re-implementation of the driver's oracle comparison.

Runs a Spark query and its DuckDB oracle SQL on the same parquet
tables, then compares row count, column names, and order-insensitive
values — the same gate CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import math

import duckdb

from customer_churn_prediction_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _canon(value):
    """Canonicalize one cell for order-insensitive comparison."""
    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # Rounded-to-grid doubles compare exactly; guard stray noise.
        return f"{value:.9g}"
    return str(value)


def canonical_rows(df) -> list[tuple]:
    """pandas.DataFrame -> sorted list of tuples over name-sorted columns."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort()
    return out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str):
    sdf = spark_df.toPandas()
    odf = run_oracle(oracle_sql, sf_dir)
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"row count: spark={len(sdf)} oracle={len(odf)}"
    srows = canonical_rows(sdf)
    orows = canonical_rows(odf)
    if srows != orows:
        diffs = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")


def assert_df_equal(df_a, df_b):
    """Two Spark DataFrames are value-equal (order-insensitive)."""
    pa, pb = df_a.toPandas(), df_b.toPandas()
    assert sorted(pa.columns) == sorted(pb.columns)
    assert len(pa) == len(pb)
    assert canonical_rows(pa) == canonical_rows(pb)
