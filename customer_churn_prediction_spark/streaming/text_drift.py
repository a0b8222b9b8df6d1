"""Continuously-maintained text-corpus drift: streaming
hashed-vocabulary PSI vs the frozen at-rest corpus.

The batch report (``ml/drift_features.text_drift_psi``) verifies the
histogram/PSI construction over two snapshots in one pass; the
production question is about the ARRIVING stream — are the documents
being ingested (a new crawl source, a language-mix shift, template
churn) still distributed like the corpus the tokenizer/filters were
tuned on? This completes the drift-twin matrix: scalar
(``streaming/drift.maintain_drift_psi``), vector
(``streaming/vector_drift.maintain_embedding_drift``), and now TEXT —
all three assembled from the same parts:

  * the bucketing is the batch report's md5 hash into TEXT_DRIFT_B
    buckets — a pure map on the arriving batch, nothing fit;
  * the baseline is the at-rest corpus's bucket histogram, computed
    once (<= TEXT_DRIFT_B rows — the reference artifact; it must not
    move with the stream);
  * the stream side is a <= TEXT_DRIFT_B-row running aggregate in
    ``complete`` mode, so every epoch hands ``foreachBatch`` the full
    current histogram and the report is a pure function of it (epoch
    replay idempotent — no partition bookkeeping);
  * the report is the ONE shared PSI formula
    (``ml/monitoring.psi_from_counts``) published through the atomic
    ``_LATEST`` discipline (``drift.publish_epoch_report``).

Scale: stream state = TEXT_DRIFT_B rows regardless of ingest volume
or vocabulary size (the hash fixes the histogram width); per-epoch
shuffle = the map-side-combined bucket counts of that epoch's files;
report write = O(TEXT_DRIFT_B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..ml.drift_features import TEXT_DRIFT_B, _td_bucket
from ..ml.monitoring import _PSI_EPS, psi_from_counts
from .drift import publish_epoch_report
from .windows import stream_to_batch_sink


def _bucketed_tokens(docs: DataFrame) -> DataFrame:
    """(bucket) rows, one per token occurrence — the batch report's
    tokenization and hash, so the twin cannot drift from it."""
    return docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok")
    ).select(_td_bucket(F.col("tok")).alias("bucket"))


def baseline_vocab_histogram(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, int]]:
    """(bucket, count) of the frozen at-rest corpus — computed once
    per deployment, never moved by the stream."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    rows = (
        _bucketed_tokens(docs).groupBy("bucket").count().collect()
    )
    return sorted((int(r.bucket), int(r["count"])) for r in rows)


def streaming_vocab_histogram(docs_stream: DataFrame) -> DataFrame:
    """The running <= TEXT_DRIFT_B-row bucket aggregate of the
    arriving documents (use outputMode='complete')."""
    return _bucketed_tokens(docs_stream).groupBy("bucket").count()


def vocab_psi_report(
    spark: SparkSession,
    baseline: list[tuple[int, int]],
    current_hist: DataFrame,
) -> DataFrame:
    """Per-bucket PSI of the stream-so-far vs the at-rest corpus, via
    the one shared PSI formula."""
    base_df = spark.createDataFrame(baseline, "bucket bigint, base_n long")
    joined = (
        base_df.join(
            current_hist.select(
                "bucket", F.col("count").alias("curr_n")
            ),
            "bucket",
            "full",
        )
        .select(
            "bucket",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("curr_n", F.lit(0)).alias("curr_n"),
        )
    )
    return psi_from_counts(
        joined, nbins=TEXT_DRIFT_B, eps=_PSI_EPS, with_fracs=False
    )


def maintain_text_drift(
    spark: SparkSession,
    sf_dir: str,
    docs_stream: DataFrame,
    report_path: str,
    checkpoint: str | None = None,
):
    """Start the maintenance query: every epoch republishes the
    vocabulary PSI report of the documents ingested so far vs the
    frozen corpus."""
    baseline = baseline_vocab_histogram(spark, sf_dir)
    hist = streaming_vocab_histogram(docs_stream)

    def write_report(batch_df: DataFrame, epoch_id: int) -> None:
        publish_epoch_report(
            vocab_psi_report(spark, baseline, batch_df),
            report_path,
            epoch_id,
        )

    return stream_to_batch_sink(
        hist,
        write_report,
        query_name="text-drift-maintenance",
        output_mode="complete",
        checkpoint=checkpoint,
    )
