"""Measure the int8 quantization tier's payoff: store bytes at rest
and brute-force search wall time, float32 vs int8, on the same
embeddings fixture.

The quantization tier's reason to exist is a 4× smaller vector store
and correspondingly cheaper search IO (similarity/ann.py:308-475);
this script turns that claim into numbers for SCALE.md §9:

* writes BOTH at-rest forms with identical writer settings —
  float store (vec_id, v array<float>, nrm) vs int8 store
  (vec_id, scale, qv array<tinyint>, nrm8) — and reports directory
  bytes;
* times the identical brute-force top-k plan reading each store
  (median of N passes, noop sink, plans warmed once).

Usage: python scripts/int8_payoff.py [--sf-dir DIR] [--iters N]
Prints one JSON object.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):  # data files only
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.session import get_spark
    from customer_churn_prediction_spark.similarity import ann
    from customer_churn_prediction_spark.sources.writers import (
        sf_tag,
        warehouse_store,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(
        app_name="int8-payoff",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    tag = sf_tag(args.sf_dir)

    # --- float store: the same relation the float search scans,
    # written with the same writer settings as int8_store_ingest so
    # the size comparison is writer-for-writer fair (array<float>
    # elements land as parquet FLOAT pages).
    float_table = f"float_store_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {float_table}")
    float_path = os.path.join(warehouse_store(), float_table)
    e = ann._embeddings(spark, args.sf_dir)
    (
        e.select(
            "vec_id",
            F.expr("transform(v, x -> cast(x as float))").alias("v"),
            "nrm",
        )
        .write.mode("overwrite")
        .option("path", float_path)
        .format("parquet")
        .saveAsTable(float_table)
    )

    # --- int8 store: the engine's own ingest (idempotent; force a
    # fresh build so both stores come from this session's writer).
    int8_table = f"int8_store_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {int8_table}")
    int8_path = os.path.join(warehouse_store(), int8_table)
    import shutil

    shutil.rmtree(int8_path, ignore_errors=True)
    ann.int8_store_ingest(spark, args.sf_dir)

    float_bytes = dir_bytes(float_path)
    int8_bytes = dir_bytes(int8_path)

    # --- searches: identical plan shape, different scan side.
    def float_search():
        store = spark.table(float_table)
        q = store.where(F.col("vec_id") < ann.N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        from pyspark.sql import Window

        pairs = store.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            ann._cosine("qv", "v", "qn", "nrm").alias("cosine_sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_sim").desc(), F.col("neighbor_id")
        )
        return (
            pairs.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= ann.TOP_K)
            .select("query_id", "neighbor_id", "cosine_sim", "rank")
        )

    def int8_search():
        return ann._int8_topk(
            spark.table(int8_table).where(F.col("nrm8") > 0)
        )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(float_search())  # warm codegen
    force(int8_search())
    t_float, t_int8 = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        force(float_search())
        t_float.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(int8_search())
        t_int8.append(time.perf_counter() - t0)

    def column_bytes(path: str, col: str) -> int:
        import glob

        import pyarrow.parquet as pq

        total = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for c in range(g.num_columns):
                    cc = g.column(c)
                    if cc.path_in_schema.split(".")[0] == col:
                        total += cc.total_compressed_size
        return total

    v_bytes = column_bytes(float_path, "v")
    qv_bytes = column_bytes(int8_path, "qv")
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "float_store_bytes": float_bytes,
                "int8_store_bytes": int8_bytes,
                "bytes_ratio": round(float_bytes / int8_bytes, 2),
                # vector column alone — the part that scales with
                # dimensionality; id/norm/scale columns are
                # width-independent and dilute the whole-table ratio
                # at toy sf.
                "float_vector_bytes": v_bytes,
                "int8_vector_bytes": qv_bytes,
                "vector_bytes_ratio": round(v_bytes / qv_bytes, 2),
                "float_search_sec": round(statistics.median(t_float), 3),
                "int8_search_sec": round(statistics.median(t_int8), 3),
                "iters": args.iters,
            }
        )
    )
    spark.sql(f"DROP TABLE IF EXISTS {float_table}")


if __name__ == "__main__":
    main()
