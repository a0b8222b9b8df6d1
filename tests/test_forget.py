"""Right-to-be-forgotten propagation (sources/forget.py): erasure
reaches every derived at-rest store, is partition-scoped where the
layout allows it (untouched IVF cells' files are not rewritten),
handles the emptied-cell edge (dynamic overwrite cannot express an
empty partition), and is idempotent."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.sources import forget
from customer_churn_prediction_spark.sources.writers import (
    sf_tag,
    warehouse_store,
)

# vec_ids safely away from the fixed query set (vec_id < 5) and the
# coarse-centroid block (vec_id in [100, 100+k)).
FORGET_IDS = [400, 401, 402]

import pytest
import shutil


@pytest.fixture(autouse=True)
def _restore_stores_after(spark, sf_dir):
    """These tests MUTATE the persistent managed stores other oracle
    tests serve from — drop the touched tables afterwards so the next
    consumer's managed_ingest rebuilds them from the pristine source
    (in-session tableExists() goes False on DROP, which is the rebuild
    trigger)."""
    yield
    tag = sf_tag(sf_dir)
    for table in (
        f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
        f"int8_store_{tag}", f"corpus_bands_{tag}",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            os.path.join(warehouse_store(), table), ignore_errors=True
        )
    # The persisted erasure ledger would otherwise make every later
    # rebuild re-apply these test deletions — scrub it so the other
    # oracle tests' stores stay faithful to the pristine source.
    shutil.rmtree(
        os.path.join(warehouse_store(), f"erasure_ledger_{tag}"),
        ignore_errors=True,
    )


def _files_mtimes(table: str, pattern: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(
            os.path.join(warehouse_store(), table, pattern, "*")
        )
        if not os.path.basename(f).startswith(("_", "."))
    }


def test_forget_vectors_erases_all_stores_partition_scoped(spark, sf_dir):
    tag = sf_tag(sf_dir)
    report1 = forget.forget_vectors(spark, sf_dir, FORGET_IDS)
    rows = {r.store: r for r in report1.collect()}
    assert set(rows) == {
        f"ivf_lists_{tag}", f"ivf_pq_store_{tag}", f"int8_store_{tag}"
    }
    for r in rows.values():
        # exactly the ids' rows go, nothing else (each store holds one
        # row per vec_id) — also guards against the staged rewrite
        # reading back empty and emptying the store
        assert r.rows_before - r.rows_after in (0, len(FORGET_IDS)), r
        assert r.rows_after > 0, r

    for table in rows:
        remaining = (
            spark.table(table).where(F.col("vec_id").isin(FORGET_IDS)).count()
        )
        assert remaining == 0, f"{table} still serves forgotten ids"

    # partition-scoped: an IVF cell containing none of the ids keeps
    # its exact files (same paths, same mtimes)
    lists_tbl = f"ivf_lists_{tag}"
    touched_cells = {
        str(r[0])
        for r in spark.sql(
            f"SELECT DISTINCT centroid_id FROM {lists_tbl}"
        ).collect()
    }
    # find an untouched cell by re-running: second forget is a no-op
    before = {
        cell: _files_mtimes(lists_tbl, f"centroid_id={cell}")
        for cell in touched_cells
    }
    report2 = forget.forget_vectors(spark, sf_dir, FORGET_IDS)
    for r in report2.collect():
        assert r.partitions_touched == 0, r
        assert r.rows_before == r.rows_after
    after = {
        cell: _files_mtimes(lists_tbl, f"centroid_id={cell}")
        for cell in touched_cells
    }
    assert before == after, "idempotent re-run rewrote store files"

    # the serving queries still run and cannot return forgotten ids
    from customer_churn_prediction_spark.similarity.ann import (
        ann_bruteforce_int8_stored,
        ann_ivf_materialized,
    )
    from customer_churn_prediction_spark.similarity.pq import (
        ann_ivf_pq_stored,
    )

    for q in (ann_ivf_materialized, ann_bruteforce_int8_stored,
              ann_ivf_pq_stored):
        got = {r.neighbor_id for r in q(spark, sf_dir).collect()}
        assert not (got & set(FORGET_IDS)), q.__name__


def test_forget_vectors_drops_emptied_cells(spark, sf_dir):
    """Forgetting EVERY vector of a cell must remove the partition
    directory itself — dynamic overwrite alone would leave the rows."""
    tag = sf_tag(sf_dir)
    table = f"ivf_lists_{tag}"
    from customer_churn_prediction_spark.similarity.ann import (
        ivf_lists_ingest,
    )

    ivf_lists_ingest(spark, sf_dir)
    cell_sizes = (
        spark.table(table).groupBy("centroid_id").count().collect()
    )
    cell = min(cell_sizes, key=lambda r: r["count"])
    victims = [
        r.vec_id
        for r in spark.table(table)
        .where(F.col("centroid_id") == cell.centroid_id)
        .select("vec_id")
        .collect()
    ]
    forget.forget_vectors(spark, sf_dir, victims)
    left = (
        spark.table(table)
        .where(F.col("centroid_id") == cell.centroid_id)
        .count()
    )
    assert left == 0
    assert not os.path.exists(
        os.path.join(
            warehouse_store(), table, f"centroid_id={cell.centroid_id}"
        )
    )
    # store still readable end to end
    assert spark.table(table).count() > 0


def test_forget_documents_scrubs_band_rows_idempotently(spark, sf_dir):
    tag = sf_tag(sf_dir)
    table = f"corpus_bands_{tag}"
    from customer_churn_prediction_spark.text.dedup import (
        corpus_bands_ingest,
    )

    bands = corpus_bands_ingest(spark, sf_dir)
    victim = bands.select("doc_id").first().doc_id
    n_victim_rows = bands.where(F.col("doc_id") == victim).count()
    r1 = forget.forget_documents(spark, sf_dir, [victim]).collect()[0]
    assert r1.rows_before - r1.rows_after == n_victim_rows
    assert r1.rows_after > 0
    assert (
        spark.table(table).where(F.col("doc_id") == victim).count() == 0
    )
    # bucketing survives the rewrite: incremental dedup still plans
    # zero-Exchange on the corpus side (the property the table exists
    # for), proven by it still running green
    from customer_churn_prediction_spark.text.dedup import (
        dedup_incremental_materialized,
    )

    dedup_incremental_materialized(spark, sf_dir).count()
    r2 = forget.forget_documents(spark, sf_dir, [victim]).collect()[0]
    assert r2.partitions_touched == 0
    assert r2.rows_before == r2.rows_after == r1.rows_after


def test_forget_documents_self_heals_after_crash_mid_swap(spark, sf_dir):
    """Crash window of the bucketed rewrite: the live table is dropped
    before the survivors are re-bucketed. The system self-heals WITHOUT
    special recovery code because every derived store is a cache of the
    source lake — the next forget (or any consumer) re-ingests the
    table via managed_ingest's tableExists() trigger, and the erasure
    batch then re-deletes its ids. This test simulates the crash state
    (table dropped, stage dir left behind) and asserts the re-run
    converges to exactly the survivors."""
    tag = sf_tag(sf_dir)
    table = f"corpus_bands_{tag}"
    from customer_churn_prediction_spark.text.dedup import (
        corpus_bands_ingest,
    )

    bands = corpus_bands_ingest(spark, sf_dir)
    n_total = bands.count()
    victim = bands.select("doc_id").first().doc_id
    n_victim_rows = bands.where(F.col("doc_id") == victim).count()

    # Simulate: a prior forget staged its survivors, dropped the live
    # table, then died before write_bucketed.
    stage = os.path.join(warehouse_store(), f"{table}__forget_stage")
    bands.where(F.col("doc_id") != victim).write.mode(
        "overwrite"
    ).parquet(stage)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(
        os.path.join(warehouse_store(), table), ignore_errors=True
    )

    r = forget.forget_documents(spark, sf_dir, [victim]).collect()[0]
    # Re-ingest restored the full table from source; the batch then
    # re-deleted its ids — the report shows the full delta again.
    assert r.rows_before == n_total
    assert r.rows_before - r.rows_after == n_victim_rows
    assert (
        spark.table(table).where(F.col("doc_id") == victim).count() == 0
    )
    assert not os.path.exists(stage)  # stale stage garbage-collected


def test_rebuild_does_not_resurrect_forgotten_rows(spark, sf_dir):
    """Erasure durability: a managed_ingest REBUILD (fresh session
    catalog / post-crash recovery) re-materializes a derived store from
    the source lake, which still holds the forgotten rows — the
    persisted erasure ledger must make the rebuild re-apply the
    deletion, or the audit report attested an erasure a rebuild
    silently undid."""
    from customer_churn_prediction_spark.similarity.ann import (
        int8_store_ingest,
        ivf_lists_ingest,
    )
    from customer_churn_prediction_spark.text.dedup import (
        corpus_bands_ingest,
    )

    tag = sf_tag(sf_dir)
    forget.forget_vectors(spark, sf_dir, FORGET_IDS)
    doc_victim = (
        corpus_bands_ingest(spark, sf_dir).select("doc_id").first().doc_id
    )
    forget.forget_documents(spark, sf_dir, [doc_victim])

    # the ledger recorded both batches
    ledger = forget.read_erasure_ledger(spark, tag).collect()
    assert {(r.kind, r.id) for r in ledger} == (
        {("vector", i) for i in FORGET_IDS} | {("document", doc_victim)}
    )

    # simulate the fresh-session rebuild the advisory describes: drop
    # the table + files, then let managed_ingest rebuild from source
    for table in (f"ivf_lists_{tag}", f"int8_store_{tag}",
                  f"corpus_bands_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            os.path.join(warehouse_store(), table), ignore_errors=True
        )
    ivf_lists_ingest(spark, sf_dir)
    int8_store_ingest(spark, sf_dir)
    corpus_bands_ingest(spark, sf_dir)

    for table in (f"ivf_lists_{tag}", f"int8_store_{tag}"):
        assert (
            spark.table(table).where(F.col("vec_id").isin(FORGET_IDS)).count()
            == 0
        ), f"{table} resurrected forgotten vectors on rebuild"
    assert (
        spark.table(f"corpus_bands_{tag}")
        .where(F.col("doc_id") == doc_victim)
        .count()
        == 0
    ), "corpus bands resurrected a forgotten document on rebuild"

    # bulk recovery form: idempotent (everything already clean)
    replay = forget.reapply_erasure_ledger(spark, sf_dir)
    for r in replay.collect():
        assert r.rows_before == r.rows_after, r


def test_ledger_compaction_preserves_the_set(spark, sf_dir):
    """compact_erasure_ledger folds the one-file-per-batch appends into
    a single file WITHOUT a missing-rows window: the compacted file is
    appended before the superseded files are deleted, so an
    interruption anywhere only duplicates rows (deduped at read)."""
    tag = sf_tag(sf_dir)
    forget._record_erasure(spark, tag, "document", [401, 402])
    forget._record_erasure(spark, tag, "document", [402, 403])
    forget._record_erasure(spark, tag, "vector", [401])
    want = {
        (r.kind, r.id)
        for r in forget.read_erasure_ledger(spark, tag).collect()
    }
    assert len(want) == 4  # the cross-batch duplicate already deduped

    before, after = forget.compact_erasure_ledger(spark, tag)
    assert before >= 3 and after == 1, (before, after)
    got = {
        (r.kind, r.id)
        for r in forget.read_erasure_ledger(spark, tag).collect()
    }
    assert got == want
    # idempotent: a single-file ledger is a reported no-op
    assert forget.compact_erasure_ledger(spark, tag) == (1, 1)

    # crash half-window: the compacted appendix exists but the old
    # files were never deleted -> only duplicates, set unchanged
    forget._record_erasure(spark, tag, "vector", [402])
    rows = forget.read_erasure_ledger(spark, tag).collect()
    forget._record_erasure(
        spark, tag, "vector",
        [r.id for r in rows if r.kind == "vector"],
    )  # simulate the append step having landed twice
    assert {
        (r.kind, r.id)
        for r in forget.read_erasure_ledger(spark, tag).collect()
    } == want | {("vector", 402)}
