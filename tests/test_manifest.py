"""Training-run input manifest: freeze / verify / drift detection."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from customer_churn_prediction_spark.sources import manifest

TABLES = ("region", "nation", "documents")


def test_freeze_then_verify_clean(spark, sf_dir, tmp_path):
    mpath = str(tmp_path / "run.manifest.json")
    doc = manifest.write_manifest(spark, sf_dir, mpath, tables=TABLES)
    assert {r["table"] for r in doc["files"]} == set(TABLES)
    assert all(r["bytes"] > 0 and r["n_rows"] > 0 for r in doc["files"])
    # empty discrepancy frame IS the verification
    assert manifest.verify_manifest(spark, mpath).count() == 0


def _snapshot(spark, sf_dir, dest, tables):
    """A mutable directory-backed copy of the (file-backed, read-only)
    fixtures: re-written through Spark so each table is a directory of
    part files, the layout every mutation scenario below needs."""
    os.makedirs(dest, exist_ok=True)
    for t in tables:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(dest, f"{t}.parquet"))


def test_verify_detects_every_drift_kind(spark, sf_dir, tmp_path):
    snap = str(tmp_path / "snap")
    _snapshot(spark, sf_dir, snap, TABLES)
    mpath = str(tmp_path / "run.manifest.json")
    manifest.write_manifest(spark, snap, mpath, tables=TABLES)
    assert manifest.verify_manifest(spark, mpath).count() == 0

    # ADDED: a compaction/upsert drops a new data file in
    extra = os.path.join(snap, "region.parquet", "part-extra.parquet")
    spark.createDataFrame([(99, "x", "y")], "a int, b string, c string")\
        .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "xtra"))
    src_file = next(
        f for f in os.listdir(str(tmp_path / "xtra"))
        if f.endswith(".parquet")
    )
    shutil.copy(os.path.join(str(tmp_path / "xtra"), src_file), extra)
    # MISSING: an erasure removed a documents file
    doc_dir = os.path.join(snap, "documents.parquet")
    victim = next(
        os.path.join(doc_dir, f)
        for f in os.listdir(doc_dir)
        if f.endswith(".parquet")
    )
    os.remove(victim)
    # CHANGED: a nation file rewritten in place (size differs)
    nat_dir = os.path.join(snap, "nation.parquet")
    nat_file = next(
        os.path.join(nat_dir, f)
        for f in os.listdir(nat_dir)
        if f.endswith(".parquet")
    )
    with open(nat_file, "ab") as f:
        f.write(b"\x00" * 16)

    got = {
        (r.table, r.status)
        for r in manifest.verify_manifest(spark, mpath).collect()
    }
    assert ("region", "added") in got
    assert ("documents", "missing") in got
    assert ("nation", "changed") in got


def test_verify_relocated_copy_passes_without_mtime(
    spark, sf_dir, tmp_path
):
    """A byte-identical copy at a new path verifies clean when the
    caller names the relocated dir — copies re-stamp mtimes, so only
    sizes and row counts bind there."""
    snap = str(tmp_path / "orig")
    _snapshot(spark, sf_dir, snap, ("region", "nation"))
    mpath = str(tmp_path / "m.json")
    manifest.write_manifest(spark, snap, mpath, tables=("region", "nation"))
    moved = str(tmp_path / "moved")
    shutil.copytree(snap, moved)
    assert manifest.verify_manifest(spark, mpath, sf_dir=moved).count() == 0
    # and a row-level change in the copy still fails it
    extra_rows = spark.read.parquet(
        os.path.join(moved, "region.parquet")
    ).limit(1)
    extra_rows.write.mode("append").parquet(
        os.path.join(moved, "region.parquet")
    )
    bad = manifest.verify_manifest(spark, mpath, sf_dir=moved)
    assert bad.where(F.col("table") == "region").count() > 0


def test_store_manifest_detects_erasure(spark, sf_dir, tmp_path):
    """A serving deployment pins its index version: the store manifest
    verifies clean until an erasure batch touches the store, then
    reports the drift — the re-pin signal."""
    from customer_churn_prediction_spark.similarity.pq import (
        ivf_pq_store_ingest,
    )
    from customer_churn_prediction_spark.sources import forget
    from customer_churn_prediction_spark.sources.writers import (
        sf_tag,
        warehouse_store,
    )

    tag = sf_tag(sf_dir)
    table = f"ivf_pq_store_{tag}"
    ivf_pq_store_ingest(spark, sf_dir)
    try:
        mpath = str(tmp_path / "stores.json")
        manifest.write_store_manifest(spark, (table,), mpath)
        assert manifest.verify_store_manifest(spark, mpath).count() == 0
        victim = int(
            spark.table(table).select("vec_id").first().vec_id
        )
        forget.forget_vectors(spark, sf_dir, [victim])
        drift = manifest.verify_store_manifest(spark, mpath)
        assert drift.count() > 0
        assert {r.table for r in drift.collect()} == {table}
    finally:
        # restore discipline: erasure mutated the shared store
        for t in (f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
                  f"int8_store_{tag}"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(
                os.path.join(warehouse_store(), t), ignore_errors=True
            )
