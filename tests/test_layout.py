"""Layout + compaction (sources/layout.py): partition pruning and
row-group skipping asserted from EXECUTED scan metrics, compaction
correctness/idempotency from real file listings."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.sources import layout


def _files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(p)
        and not os.path.basename(p).startswith(("_", "."))
    ]


def test_lang_filter_prunes_files_in_executed_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_layout")
    docs = load_table(spark, sf_dir, "documents")
    layout.write_corpus_layout(docs, out)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    assert len(langs) > 1
    total_files = len(_files(out))

    one = spark.read.parquet(out).where(F.col("lang") == langs[0])
    m = layout.scan_metrics(one)
    assert 0 < m["numFiles"] < total_files
    # and the result is exactly that language's rows
    expected = docs.where(F.col("lang") == langs[0]).count()
    assert m["numOutputRows"] == expected


def test_range_layout_sorts_within_files(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions must leave each file
    internally sorted by n_chars with near-disjoint ranges — the
    precondition for parquet min/max skipping on length predicates."""
    out = str(tmp_path / "corpus_layout2")
    docs = load_table(spark, sf_dir, "documents")
    layout.write_corpus_layout(docs, out)
    # pick one partition dir with >1 file
    part_dirs = [
        d for d in glob.glob(os.path.join(out, "lang=*")) if os.path.isdir(d)
    ]
    checked = 0
    for d in part_dirs:
        for f in _files(d):
            vals = [r.n_chars for r in spark.read.parquet(f).collect()]
            assert vals == sorted(vals), f
            checked += 1
    assert checked >= len(part_dirs)


def test_length_predicate_is_pushed_to_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_layout3")
    layout.write_corpus_layout(load_table(spark, sf_dir, "documents"), out)
    q = spark.read.parquet(out).where(
        (F.col("lang") == "en") & (F.col("n_chars") > 200)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(n_chars" in plan
    assert "PartitionFilters" in plan


def test_compaction_binpacks_only_fragmented_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "fragmented")
    docs = load_table(spark, sf_dir, "documents")
    # simulate micro-batch ingest: 12 files per partition
    docs.repartition(12).write.mode("overwrite").partitionBy("lang").parquet(out)
    before = spark.read.parquet(out)
    before_rows = before.count()
    before_files = len(_files(out))

    report = layout.compact_partitions(spark, out, target_bytes=64 * 1024 * 1024)
    rows = {r.partition: r for r in report.collect()}
    assert rows, "no partitions reported"
    after_files = len(_files(out))
    assert after_files < before_files
    for r in rows.values():
        assert r.files_after <= r.files_before
        assert r.files_after >= 1

    # data unchanged (content equality incl. the partition column)
    after = spark.read.parquet(out)
    assert after.count() == before_rows
    assert (
        after.groupBy("lang").count().orderBy("lang").collect()
        == load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .orderBy("lang")
        .collect()
    )

    # idempotent: second run touches nothing
    report2 = layout.compact_partitions(spark, out, target_bytes=64 * 1024 * 1024)
    for r in report2.collect():
        assert r.files_before == r.files_after
    assert len(_files(out)) == after_files


def test_compaction_leaves_compact_partitions_alone(spark, sf_dir, tmp_path):
    out = str(tmp_path / "already_compact")
    load_table(spark, sf_dir, "documents").coalesce(1).write.mode(
        "overwrite"
    ).partitionBy("lang").parquet(out)
    files_before = sorted(_files(out))
    mtimes = {f: os.path.getmtime(f) for f in files_before}
    layout.compact_partitions(spark, out, target_bytes=64 * 1024 * 1024)
    files_after = sorted(_files(out))
    assert files_after == files_before
    assert all(os.path.getmtime(f) == mtimes[f] for f in files_after)
