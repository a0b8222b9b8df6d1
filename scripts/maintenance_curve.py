"""Scale curve for the two at-rest maintenance rewrites.

`upsert_partitioned` (SCD-1 staged-swap merge, `sources/merge.py`) and
`compact_partitions` (small-file bin-packing, `sources/layout.py`) have
correctness + crash-recovery tests but their REWRITE cost is the
100 TB risk surface (VERDICT r6 item 5): both rewrite whole partition
directories, so the claim under test is

- upsert cost tracks the TOUCHED partitions' bytes (plus a fixed
  metadata-swap overhead), NOT the table size — growing the corpus 10x
  while touching the same one partition should grow wall time far less
  than 10x (scan+rewrite of one 10x-bigger partition rides the same
  fixed job overheads);
- compaction cost tracks the FRAGMENTED bytes it rewrites, and the
  idempotent re-run (nothing left to compact) is metadata-flat at any
  size.

Fixture: the orders table hive-partitioned by order-month (~80
partitions at every SF, so the 10x step grows bytes-per-partition, the
realistic growth mode for a date-partitioned lake) written with 16-way
fragmentation per partition for the compaction case.

Usage: python scripts/maintenance_curve.py   (run ALONE — the bench
contention caveat applies; ~2-4 min).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from customer_churn_prediction_spark.session import get_spark  # noqa: E402
from customer_churn_prediction_spark.sources.layout import (  # noqa: E402
    compact_partitions,
)
from customer_churn_prediction_spark.sources.merge import (  # noqa: E402
    upsert_partitioned,
)

SFS = [("sf0.01", "/root/testdata/sf0.01"), ("sf0.1", "/root/testdata/sf0.1")]
WORK = os.path.join(REPO, ".scale", "maintenance")


def _monthly_orders(spark, sf_dir: str):
    return (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
    )


def _write_base(df, path: str, frag: int) -> None:
    shutil.rmtree(path, ignore_errors=True)
    # frag-way fragmentation per month dir (round-robin inside each
    # partition) — the small-file state compaction exists to fix.
    df.repartition(frag).write.mode("overwrite").partitionBy(
        "month"
    ).parquet(path)


def main() -> None:
    spark = get_spark(
        app_name="maintenance-curve", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(WORK, exist_ok=True)

    # Warm-up at sf0.001: both ops once, so the measured cells time the
    # rewrite work, not the first job's codegen/JVM warm-up.
    warm = _monthly_orders(spark, "/root/testdata/sf0.001")
    wbase = os.path.join(WORK, "warm")
    _write_base(warm, wbase, frag=4)
    upsert_partitioned(
        spark, wbase,
        warm.limit(50).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        ).dropDuplicates(["o_orderkey"]),
        "o_orderkey", "month",
    )
    compact_partitions(spark, wbase).collect()
    shutil.rmtree(wbase, ignore_errors=True)

    print("\n## upsert_partitioned: touched-partition cost vs table size\n")
    print(
        "| sf | rows | months | 1-month batch rows | upsert 1 month (s) "
        "| upsert 8 months (s) |"
    )
    print("|---|---|---|---|---|---|")
    for label, sf_dir in SFS:
        orders = _monthly_orders(spark, sf_dir).cache()
        n = orders.count()
        months = sorted(
            r.month for r in orders.select("month").distinct().collect()
        )
        base = os.path.join(WORK, f"upsert_{label}")
        _write_base(orders, base, frag=4)

        def batch(month_set):
            return (
                orders.where(F.col("month").isin(month_set))
                .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
            )

        one = batch(months[:1]).cache()
        n_one = one.count()
        t0 = time.monotonic()
        upsert_partitioned(spark, base, one, "o_orderkey", "month")
        t_one = time.monotonic() - t0
        eight = batch(months[:8]).cache()
        eight.count()
        t0 = time.monotonic()
        upsert_partitioned(spark, base, eight, "o_orderkey", "month")
        t_eight = time.monotonic() - t0
        print(
            f"| {label} | {n} | {len(months)} | {n_one} "
            f"| {t_one:.2f} | {t_eight:.2f} |"
        )
        orders.unpersist(); one.unpersist(); eight.unpersist()
        shutil.rmtree(base, ignore_errors=True)

    print("\n## compact_partitions: fragmented-bytes cost + idempotent re-run\n")
    print(
        "| sf | rows | files before | files after | compact (s) "
        "| re-run no-op (s) |"
    )
    print("|---|---|---|---|---|---|")
    for label, sf_dir in SFS:
        orders = _monthly_orders(spark, sf_dir)
        n = orders.count()
        base = os.path.join(WORK, f"compact_{label}")
        _write_base(orders, base, frag=16)
        t0 = time.monotonic()
        rep = compact_partitions(spark, base).collect()
        t_first = time.monotonic() - t0
        before = sum(r.files_before for r in rep)
        after = sum(r.files_after for r in rep)
        t0 = time.monotonic()
        rep2 = compact_partitions(spark, base).collect()
        t_second = time.monotonic() - t0
        assert all(r.files_before == r.files_after for r in rep2)
        print(
            f"| {label} | {n} | {before} | {after} "
            f"| {t_first:.2f} | {t_second:.2f} |"
        )
        shutil.rmtree(base, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
