"""Serve payoff of the maintained benchmark-gram registry (r13,
eleventh family): inline ``text_ngram_novelty`` re-shingles the
reference slice per call; ``novelty_report`` joins the at-rest gram
set instead. Measures, at sf0.1 and the ×10 docs fixture (medians of
3 after a warm-up): the one-time registry ingest, the inline op, and
the store-served scoring of the same non-reference corpus.

Usage: python scripts/novelty_store_curve.py (run ALONE).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from customer_churn_prediction_spark.catalog import load_table  # noqa: E402
from customer_churn_prediction_spark.session import get_spark  # noqa: E402
from customer_churn_prediction_spark.streaming import novelty as snov  # noqa: E402
from customer_churn_prediction_spark.text import dedup  # noqa: E402

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10", os.path.join(REPO, ".scale", "sf1docs")),
]


def main() -> None:
    spark = get_spark(app_name="novelty-store-curve", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def med3(fn) -> float:
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            force(fn())
            walls.append(time.monotonic() - t0)
        return statistics.median(walls)

    for tag, sf_dir in POINTS:
        # spread=True: the shingle explode is heavy per-row expression
        # work, and a small parquet arrives as ONE task without it —
        # the same rule every inline documents op applies
        docs = load_table(spark, sf_dir, "documents", spread=True).select(
            "doc_id", "text"
        )
        bench = docs.where(F.col("doc_id") % 10 == 7)
        corpus = docs.where(F.col("doc_id") % 10 != 7)
        work = tempfile.mkdtemp(prefix=f"novstore_{tag}_")
        stream_dir = os.path.join(work, "arrivals")
        bench.repartition(1).write.mode("append").parquet(stream_dir)
        store = os.path.join(work, "store")
        stream = spark.readStream.schema(
            "doc_id bigint, text string"
        ).parquet(stream_dir)
        q = snov.maintain_ref_grams(
            spark, stream, store, checkpoint=os.path.join(work, "ckpt")
        )
        t0 = time.monotonic()
        q.processAllAvailable()
        ingest = time.monotonic() - t0
        q.stop()

        force(dedup.text_ngram_novelty(spark, sf_dir))  # warm-up
        inline = med3(lambda: dedup.text_ngram_novelty(spark, sf_dir))
        serve = med3(lambda: snov.novelty_report(spark, store, corpus))
        n_grams = snov.current_ref_grams(spark, store).count()
        print(
            f"{tag}: registry ingest (once)={ingest:.2f}s"
            f" ref_grams={n_grams}"
            f" inline={inline:.2f}s serve={serve:.2f}s"
            f" (serve/inline={serve / inline:.2f})"
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
