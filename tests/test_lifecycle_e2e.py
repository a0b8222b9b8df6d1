"""At-rest store LIFECYCLE composition: ingest → serve → erase →
audit → vacuum. Every stage has its own oracle-rigor test; this file
pins that the maintenance surfaces COMPOSE on the same stores a real
deployment would run them against — the serving query keeps answering
across erasure batches, the audit trail accumulates append-only, and
retention is a deliberate vacuum with the trail's head intact."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.similarity.ann import (
    int8_store_ingest,
    ivf_lists_ingest,
)
from customer_churn_prediction_spark.similarity.pq import (
    ann_ivf_pq_stored,
    ivf_pq_store_ingest,
)
from customer_churn_prediction_spark.sources.layout import vacuum_epochs
from customer_churn_prediction_spark.sources.writers import (
    sf_tag,
    warehouse_store,
)
from customer_churn_prediction_spark.streaming import forget as sforget
from customer_churn_prediction_spark.streaming.drift import read_report


@pytest.fixture(autouse=True)
def _restore_stores_after(spark, sf_dir):
    """Erasure mutates the shared managed stores — drop them afterwards
    so the next consumer's managed_ingest rebuilds from source."""
    yield
    tag = sf_tag(sf_dir)
    for table in (
        f"ivf_lists_{tag}", f"ivf_pq_store_{tag}", f"int8_store_{tag}",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            os.path.join(warehouse_store(), table), ignore_errors=True
        )
    # also the persisted erasure ledger, or later rebuilds re-apply
    # this test's deletions to the shared oracle fixtures
    shutil.rmtree(
        os.path.join(warehouse_store(), f"erasure_ledger_{tag}"),
        ignore_errors=True,
    )


def _erase(spark, sf_dir, tmp_path, tag_name, vec_id, report_path, ckpt):
    src = str(tmp_path / "requests")
    spark.createDataFrame(
        [("vector", vec_id)], sforget.REQUEST_SCHEMA
    ).repartition(1).write.mode("append").parquet(src)
    q = sforget.start_erasure_available_now(
        spark, sf_dir,
        spark.readStream.schema(sforget.REQUEST_SCHEMA).parquet(src),
        report_path, checkpoint=ckpt,
    )
    assert q.awaitTermination(180), "erasure drain timed out"


def test_store_lifecycle_ingest_serve_erase_audit_vacuum(
    spark, sf_dir, tmp_path
):
    tag = sf_tag(sf_dir)
    # 1. INGEST: materialize the vector stores once.
    ivf_lists_ingest(spark, sf_dir)
    ivf_pq_store_ingest(spark, sf_dir)
    int8_store_ingest(spark, sf_dir)
    # 2. SERVE: the stored IVF-PQ query answers from the code table.
    before = ann_ivf_pq_stored(spark, sf_dir)
    n_before = before.count()
    assert n_before > 0
    # Pick corpus ids to erase that the stores certainly hold.
    victims = [
        int(r.vec_id)
        for r in spark.table(f"ivf_pq_store_{tag}")
        .where(F.col("vec_id") >= 300)
        .select("vec_id").distinct().limit(2).collect()
    ]
    assert len(victims) == 2
    report_path = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    # 3. ERASE twice (two epochs through one checkpoint — the batched
    # compliance cadence), serving between and after.
    _erase(spark, sf_dir, tmp_path, tag, victims[0], report_path, ckpt)
    for table in (f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
                  f"int8_store_{tag}"):
        assert (
            spark.table(table)
            .where(F.col("vec_id") == victims[0]).count() == 0
        ), table
    assert ann_ivf_pq_stored(spark, sf_dir).count() > 0  # still serving
    _erase(spark, sf_dir, tmp_path, tag, victims[1], report_path, ckpt)
    # 4. AUDIT: both epochs' records retained (append-only trail).
    epochs = sorted(
        d for d in os.listdir(report_path) if d.startswith("epoch=")
    )
    assert epochs == ["epoch=0", "epoch=1"]
    # 5. VACUUM: retention is a deliberate policy call; the trail's
    # head stays readable through the _LATEST pointer.
    vacuumed = vacuum_epochs(spark, report_path, retain_from_epoch=1)
    assert [r.epoch for r in vacuumed.collect()] == [0]
    assert sorted(
        d for d in os.listdir(report_path) if d.startswith("epoch=")
    ) == ["epoch=1"]
    latest = {r.store for r in read_report(spark, report_path).collect()}
    assert f"ivf_pq_store_{tag}" in latest
