"""Serve payoff of the maintained bigram LM (r13, twelfth family):
inline ``text_logprob_bigram`` refits the unigram+bigram count model
on every call; ``logprob_report`` scores against the at-rest counts.
Measures, at sf0.1 and the ×10 docs fixture (medians of 3 after a
warm-up): the one-time ingest, the inline op, the store-served
scoring of the SAME corpus (fit dropped), and the store-served
scoring of a SMALL batch (1% of docs — the production shape: the
arriving increment scored against the lake's LM).

Usage: python scripts/bigram_store_curve.py (run ALONE).
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
from customer_churn_prediction_spark.streaming import bigram as sbg  # noqa: E402
from customer_churn_prediction_spark.text import analysis  # noqa: E402

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("x10", os.path.join(REPO, ".scale", "sf1docs")),
]


def main() -> None:
    spark = get_spark(app_name="bigram-store-curve", master="local[32]",
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
        docs = load_table(spark, sf_dir, "documents", spread=True).select(
            "doc_id", "text"
        )
        small = docs.where(F.col("doc_id") % 100 == 1)
        work = tempfile.mkdtemp(prefix=f"bigstore_{tag}_")
        stream_dir = os.path.join(work, "arrivals")
        docs.repartition(1).write.mode("append").parquet(stream_dir)
        store = os.path.join(work, "store")
        stream = spark.readStream.schema(
            "doc_id bigint, text string"
        ).parquet(stream_dir)
        q = sbg.maintain_bigram_lm(
            spark, stream, store, checkpoint=os.path.join(work, "ckpt")
        )
        t0 = time.monotonic()
        q.processAllAvailable()
        ingest = time.monotonic() - t0
        q.stop()

        force(analysis.text_logprob_bigram(spark, sf_dir))  # warm-up
        inline = med3(lambda: analysis.text_logprob_bigram(spark, sf_dir))
        serve_full = med3(lambda: sbg.logprob_report(spark, store, docs))
        serve_small = med3(lambda: sbg.logprob_report(spark, store, small))
        n_vocab = sbg.current_vocab(spark, store).count()
        n_bi = sbg.current_bigrams(spark, store).count()
        print(
            f"{tag}: ingest (once)={ingest:.2f}s"
            f" vocab={n_vocab} bigrams={n_bi}"
            f" inline={inline:.2f}s serve_full={serve_full:.2f}s"
            f" ({serve_full / inline:.2f}x)"
            f" serve_1pct={serve_small:.2f}s"
            f" ({serve_small / inline:.2f}x)"
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
