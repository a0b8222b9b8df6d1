"""KMV family numerics: the set-operation sketch's own guarantees.

Oracle parity for ``segment_overlap_kmv`` (bit-exact — the hashes are
md5-derived so DuckDB rebuilds the identical sketch) lives in
STAGED_CORRECTNESS.json via scripts/staged_driver_sim.py; the shared
maintained-store contract (crash replay, compaction, staged-swap
heal, rebuild governance, pre-first-epoch reads) lives in the
tests/test_maintained_stores.py matrix (KMVFamily). This file pins
what is specific to KMV:

- the MERGE property (top-K of a union of per-part top-Ks equals the
  top-K of the union) — the algebra both the streaming store and the
  pair composition stand on;
- estimator accuracy on sets large enough to engage the (K-1)*S/U_K
  path, and EXACTNESS below K where the sketch degenerates to the set;
- the intersection estimator against a constructed overlap;
- the maintained store's estimates equal the batch estimates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators.sketches import (
    KMV_K,
    _KMV_NUM,
    _KMV_UNION_BAND,
    kmv_pair_report,
    kmv_sketch,
)
from customer_churn_prediction_spark.streaming import kmv as skmv


def _keys(spark, grp: str, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.col("id").cast("string").alias("key")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_property_union_of_sketches_is_sketch_of_union(spark):
    """K smallest of (per-part K smallest) == K smallest of the union:
    any hash among the union's K smallest has fewer than K hashes
    below it in its own part too. This is the whole streaming-merge
    correctness argument, so it gets its own test."""
    from pyspark.sql import Window

    parts = [
        _keys(spark, "g", 0, 400),
        _keys(spark, "g", 300, 900),  # overlapping ranges: duplicates
        _keys(spark, "g", 850, 1300),
    ]
    whole = parts[0]
    for p in parts[1:]:
        whole = whole.unionByName(p)
    direct = _rows(kmv_sketch(whole))

    merged = kmv_sketch(parts[0])
    for p in parts[1:]:
        merged = merged.unionByName(kmv_sketch(p))
    w = Window.partitionBy("grp").orderBy("h")
    remerged = (
        merged.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    assert _rows(remerged) == direct


def test_estimator_accurate_above_k_and_exact_below(spark):
    n_big = 5000
    sk = kmv_sketch(_keys(spark, "big", 0, n_big))
    row = sk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("kth")
    ).collect()[0]
    assert row.k_eff == KMV_K
    est = _KMV_NUM / row.kth
    assert abs(est - n_big) <= _KMV_UNION_BAND * n_big

    n_small = KMV_K - 10
    small = kmv_sketch(_keys(spark, "small", 0, n_small))
    assert small.count() == n_small  # below K the sketch IS the set


def test_pair_report_on_constructed_overlap(spark):
    """Two adjacent months with a known 50% overlap: the exact columns
    are exact, the estimates land in their documented bands, and the
    composed union sketch never exceeds K rows."""
    a = spark.range(0, 2000).select(
        F.lit("2024-01-01").cast("date").alias("grp"),
        F.col("id").cast("string").alias("key"),
    )
    b = spark.range(1000, 3000).select(
        F.lit("2024-02-01").cast("date").alias("grp"),
        F.col("id").cast("string").alias("key"),
    )
    sets = a.unionByName(b)
    rows = kmv_pair_report(kmv_sketch(sets), sets).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.month_a, r.month_b) == ("2024-01-01", "2024-02-01")
    assert (r.exact_a, r.exact_b) == (2000, 2000)
    assert r.exact_retained == 1000
    assert r.exact_union == 3000
    assert r.union_in_band and r.retained_in_band
    # bands are not vacuous here: the estimates are real numbers near
    # the truth, not fallbacks
    assert 0 < r.est_retained < r.est_union


def test_pair_report_drops_boundary_months(spark):
    """The first month has no predecessor and the last no successor —
    only the middle pair survives, and a month gap breaks the chain."""
    sets = None
    for m in ("2024-01-01", "2024-02-01", "2024-04-01"):
        part = spark.range(0, 200).select(
            F.lit(m).cast("date").alias("grp"),
            F.col("id").cast("string").alias("key"),
        )
        sets = part if sets is None else sets.unionByName(part)
    out = kmv_pair_report(kmv_sketch(sets), sets)
    assert [r.month_a for r in out.collect()] == ["2024-01-01"]


def test_maintained_estimates_equal_batch(spark, tmp_path):
    """After ingesting three epochs, the store's per-group estimates
    equal the batch estimator over everything ingested — the
    family-specific leg the shared matrix doesn't cover."""
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    waves = [
        spark.range(300 * i, 300 * (i + 1)).select(
            (F.col("id") % 2).cast("string").alias("grp"),
            (F.col("id") % 450).cast("string").alias("key"),
        )
        for i in range(3)
    ]
    for w in waves:
        w.repartition(1).write.mode("append").parquet(stream_dir)
    stream = (
        spark.readStream.schema("grp string, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = skmv.maintain_group_sketches(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    whole = waves[0]
    for w in waves[1:]:
        whole = whole.unionByName(w)
    batch_sketch = kmv_sketch(whole)
    assert _rows(skmv.merged_sketch(spark, store)) == _rows(batch_sketch)

    got = {
        r.grp: r.est
        for r in skmv.estimate_groups(spark, store).collect()
    }
    exact = {
        r.grp: r.n
        for r in whole.groupBy("grp")
        .agg(F.countDistinct("key").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for g, n in exact.items():
        assert abs(got[g] - n) <= _KMV_UNION_BAND * n


def test_empty_store_estimates_answer_empty(spark, tmp_path):
    out = skmv.estimate_groups(spark, str(tmp_path / "never")).collect()
    assert out == []
    assert skmv.overlap_report(
        spark, str(tmp_path / "never")
    ).collect() == []


def test_store_overlap_report_equals_batch_estimates(spark, tmp_path):
    """The production query — overlap served from the maintained
    store with NO raw data — must equal the batch report's estimate
    columns over the same ingested rows."""
    months = ["2024-01-01", "2024-02-01", "2024-03-01"]
    rows = []
    for mi, m in enumerate(months):
        for k in range(mi * 120, mi * 120 + 400):  # 280-key overlaps
            rows.append((m, str(k)))
    data = spark.createDataFrame(rows, "grp string, key string")

    stream_dir = str(tmp_path / "arrivals")
    for i in range(3):  # epoch slicing unrelated to months
        data.where(F.crc32(F.col("key")) % 3 == i).repartition(1)\
            .write.mode("append").parquet(stream_dir)
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema("grp string, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = skmv.maintain_group_sketches(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = sorted(map(tuple, skmv.overlap_report(spark, store).collect()))

    batch_sets = data.select(
        F.col("grp").cast("date").alias("grp"), "key"
    )
    want = sorted(
        (r.month_a, r.month_b, r.est_union, r.est_retained)
        for r in kmv_pair_report(
            kmv_sketch(batch_sets), batch_sets
        ).collect()
    )
    assert got == want
    assert len(got) == 2  # jan->feb, feb->mar
