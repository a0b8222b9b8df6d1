"""Erasure (right-to-be-forgotten) scale curve.

Measures `sources/forget.py` against growing derived stores:

- **forget_vectors** over the IVF inverted lists, IVF-PQ code table
  (both hive-partitioned by centroid cell → partition-scoped rewrite)
  and the int8 store (flat → staged full rewrite), at sf0.01, sf0.1,
  and the x10-embeddings fixture (`make_embeddings_x10.py`).
- **forget_documents** over the bucketed corpus-bands table at the
  same three documents scales (`make_docs_x10.py` for the 4th decade).

For each scale the script times (a) the FIRST application of a fixed
16-id erasure batch — the real work — and (b) an immediate REPLAY of
the same batch, which must be a near-no-op (the idempotence the
streaming twin `streaming/forget.py` leans on for exactly-once epoch
replay). Store ingest is done BEFORE the timed region: erasure cost is
what a compliance batch pays against an already-materialized store.

The claim under test (SCALE.md §10.4): partition-scoped erasure cost
tracks the TOUCHED CELLS, not the store; full-rewrite erasure is
linear in the store but amortizes over any batch size. Every touched
table is dropped afterwards so the next consumer's managed_ingest
rebuilds it pristine (the `tests/test_forget.py` restore discipline).

Usage: python scripts/erasure_curve.py   (writes a markdown table to
stdout — tee it; ~5-10 min dominated by the x10 ingests).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from customer_churn_prediction_spark.session import get_spark  # noqa: E402
from customer_churn_prediction_spark.sources import forget  # noqa: E402
from customer_churn_prediction_spark.sources.writers import (  # noqa: E402
    sf_tag,
    warehouse_store,
)

N_IDS = 16

VEC_SCALES = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10emb", os.path.join(REPO, ".scale", "sf1emb")),
]
DOC_SCALES = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10docs", os.path.join(REPO, ".scale", "sf1docs")),
]


def _drop(spark, tables: list[str], tag: str | None = None) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            os.path.join(warehouse_store(), t), ignore_errors=True
        )
    if tag is not None:
        # The measurement batches land in the persisted erasure ledger;
        # left behind, the next consumer's managed_ingest rebuild would
        # re-apply them to the SHARED fixture stores and break oracle
        # parity (the test_forget restore discipline, ledger included).
        shutil.rmtree(
            os.path.join(warehouse_store(), f"erasure_ledger_{tag}"),
            ignore_errors=True,
        )


def _sample_ids(
    spark, sf_dir: str, table: str, col: str, n: int = N_IDS
) -> list[int]:
    # Deterministic mid-table ids: skip the low range some fixed query
    # sets pin (vec_id < 5, the coarse-centroid block at [100, 100+k)).
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    rows = (
        df.select(col).where(f"{col} >= 400").orderBy(col).limit(n)
    ).collect()
    return [int(r[0]) for r in rows]


def main() -> None:
    spark = get_spark(app_name="erasure-curve", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    from customer_churn_prediction_spark.similarity.ann import (
        int8_store_ingest,
        ivf_lists_ingest,
    )
    from customer_churn_prediction_spark.similarity.pq import (
        ivf_pq_store_ingest,
    )
    from customer_churn_prediction_spark.text.dedup import (
        corpus_bands_ingest,
    )

    print(f"\n## Erasure curve: forget_vectors ({N_IDS}-id batch)\n")
    print("| scale | store rows (ivf/pq/int8) | first (s) | replay (s) |")
    print("|---|---|---|---|")
    for label, sf_dir in VEC_SCALES:
        if not os.path.isdir(sf_dir):
            print(f"| {label} | (fixture absent) | - | - |")
            continue
        tag = sf_tag(sf_dir)
        tables = [f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
                  f"int8_store_{tag}"]
        ivf_lists_ingest(spark, sf_dir)
        ivf_pq_store_ingest(spark, sf_dir)
        int8_store_ingest(spark, sf_dir)
        sizes = "/".join(str(spark.table(t).count()) for t in tables)
        ids = _sample_ids(spark, sf_dir, "embeddings", "vec_id")
        t0 = time.monotonic()
        forget.forget_vectors(spark, sf_dir, ids)
        first = time.monotonic() - t0
        t0 = time.monotonic()
        forget.forget_vectors(spark, sf_dir, ids)
        replay = time.monotonic() - t0
        print(f"| {label} | {sizes} | {first:.2f} | {replay:.2f} |")
        _drop(spark, tables, tag)

    print(f"\n## Erasure curve: forget_documents ({N_IDS}-id batch)\n")
    print("| scale | band rows | first (s) | replay (s) |")
    print("|---|---|---|---|")
    for label, sf_dir in DOC_SCALES:
        if not os.path.isdir(sf_dir):
            print(f"| {label} | (fixture absent) | - | - |")
            continue
        tag = sf_tag(sf_dir)
        table = f"corpus_bands_{tag}"
        corpus_bands_ingest(spark, sf_dir)
        size = spark.table(table).count()
        ids = _sample_ids(spark, sf_dir, "documents", "doc_id")
        t0 = time.monotonic()
        forget.forget_documents(spark, sf_dir, ids)
        first = time.monotonic() - t0
        t0 = time.monotonic()
        forget.forget_documents(spark, sf_dir, ids)
        replay = time.monotonic() - t0
        print(f"| {label} | {size} | {first:.2f} | {replay:.2f} |")
        _drop(spark, [table], tag)

    # Fractional batches (VERDICT r6 item 4): the bucketed corpus-bands
    # store is the honest full-rewrite path — its first-application cost
    # is ~flat in BATCH size (one staged rewrite regardless), so per-id
    # cost falls linearly with the batch and the break-even vs a
    # per-request loop is roughly batch_size ≈ 1. These rows bound that
    # claim with batches sized as a FRACTION of the corpus at each
    # scale, the shape a real compliance backlog has.
    print("\n## Fractional-batch erasure: forget_documents\n")
    print("| scale | docs | batch (frac) | first (s) | per-id (ms) |")
    print("|---|---|---|---|---|")
    for label, sf_dir in DOC_SCALES[1:]:  # sf0.1 and x10docs
        if not os.path.isdir(sf_dir):
            print(f"| {label} | (fixture absent) | - | - | - |")
            continue
        tag = sf_tag(sf_dir)
        table = f"corpus_bands_{tag}"
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        for frac in (0.001, 0.01):
            n_batch = max(1, int(n_docs * frac))
            ids = _sample_ids(
                spark, sf_dir, "documents", "doc_id", n=n_batch
            )
            corpus_bands_ingest(spark, sf_dir)  # fresh store per batch
            t0 = time.monotonic()
            forget.forget_documents(spark, sf_dir, ids)
            first = time.monotonic() - t0
            per_id_ms = first / len(ids) * 1000
            print(
                f"| {label} | {n_docs} | {len(ids)} ({frac:.1%}) "
                f"| {first:.2f} | {per_id_ms:.1f} |"
            )
            _drop(spark, [table], tag)

    spark.stop()


if __name__ == "__main__":
    main()
