"""Continuously-maintained embedding-space drift: streaming cell PSI
vs the frozen at-rest corpus.

The batch report (``ml/drift_features.embedding_drift``) answers "did
the vector population move" once, over two snapshots of the stored
table; the production question is about the ARRIVING stream — are the
vectors being ingested (new documents, a re-trained encoder upstream)
still distributed like the corpus the ANN index was built for? This is
the vector-modality twin of ``streaming/drift.maintain_drift_psi``,
assembled from the same parts:

  * the model is the SAME frozen coarse-centroid fit every ANN tier
    serves from (``similarity/ann._centroids`` — collected once,
    re-emitted as expression literals), so stream-side cell assignment
    is a pure map on the arriving batch;
  * the baseline is the at-rest corpus's cell histogram, computed once
    (N_CENTROIDS rows — the reference artifact; it must not move with
    the stream);
  * the stream side is an N_CENTROIDS-row running aggregate in
    ``complete`` mode, so every epoch hands ``foreachBatch`` the full
    current histogram, and the report is a pure function of it (epoch
    replay idempotent);
  * the report is the ONE shared PSI formula
    (``ml/monitoring.psi_from_counts``) published through the atomic
    ``_LATEST`` discipline (``drift.publish_epoch_report``).

Scale: stream state = N_CENTROIDS rows; per-epoch shuffle = the
map-side-combined cell counts of that epoch's files; report write =
O(N_CENTROIDS). Drift in the INDEX's terms — cell occupancy — is
exactly the signal that says "rebalance the IVF lists / re-train the
codebooks", which scalar feature drift cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..ml.monitoring import _PSI_EPS, psi_from_counts
from .drift import publish_epoch_report
from .windows import stream_to_batch_sink


def _cell(spark: SparkSession, sf_dir: str) -> "F.Column":
    from ..similarity.ann import _cells_expr, _centroids

    return (-F.element_at(_cells_expr(_centroids(spark, sf_dir)), 1)["nid"])


def baseline_cell_histogram(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, int]]:
    """(cell, count) of the frozen at-rest corpus — the reference the
    stream is compared against, computed once per deployment."""
    from ..similarity.ann import _embeddings

    rows = (
        _embeddings(spark, sf_dir)
        .select(_cell(spark, sf_dir).alias("bucket"))
        .groupBy("bucket")
        .count()
        .collect()
    )
    return sorted((int(r.bucket), int(r["count"])) for r in rows)


def streaming_cell_histogram(
    spark: SparkSession, sf_dir: str, vectors_stream: DataFrame
) -> DataFrame:
    """The running N_CENTROIDS-row cell aggregate of the arriving
    vectors (use outputMode='complete')."""
    from ..similarity.ann import _vec, _with_norm

    assigned = _with_norm(
        vectors_stream.select(_vec("embedding").alias("v"))
    )
    return (
        assigned.select(_cell(spark, sf_dir).alias("bucket"))
        .groupBy("bucket")
        .count()
    )


def cell_psi_report(
    spark: SparkSession,
    baseline: list[tuple[int, int]],
    current_hist: DataFrame,
) -> DataFrame:
    """Per-cell PSI of the stream-so-far vs the at-rest corpus, via
    the one shared PSI formula."""
    from ..similarity.ann import N_CENTROIDS

    base_df = spark.createDataFrame(baseline, "bucket int, base_n long")
    joined = (
        base_df.join(
            current_hist.select("bucket", F.col("count").alias("curr_n")),
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
        joined, nbins=N_CENTROIDS, eps=_PSI_EPS, with_fracs=False
    )


def maintain_embedding_drift(
    spark: SparkSession,
    sf_dir: str,
    vectors_stream: DataFrame,
    report_path: str,
    checkpoint: str | None = None,
):
    """Start the maintenance query: every epoch republishes the cell
    PSI report of the vectors ingested so far vs the frozen corpus."""
    baseline = baseline_cell_histogram(spark, sf_dir)
    hist = streaming_cell_histogram(spark, sf_dir, vectors_stream)

    def write_report(batch_df: DataFrame, epoch_id: int) -> None:
        publish_epoch_report(
            cell_psi_report(spark, baseline, batch_df),
            report_path,
            epoch_id,
        )

    return stream_to_batch_sink(
        hist,
        write_report,
        query_name="embedding-drift-maintenance",
        output_mode="complete",
        checkpoint=checkpoint,
    )
