"""Continuously-maintained drift monitor: streaming PSI vs a frozen
baseline.

The batch monitoring tier (ml/monitoring.py) answers "did the
distribution drift" once; a production pipeline wants that report
MAINTAINED as events arrive, so degradation is seen at ingest time —
the streaming twin of ``drift_psi``, built the way the rollup
maintenance sink is (rollup.py / stream_to_batch_sink):

  * the baseline histogram is computed ONCE from a frozen batch window
    and carried into the query as a tiny plan literal (it is the
    reference model artifact — it must not move with the stream);
  * the stream side is a 10-bucket running aggregate in ``complete``
    output mode (state = 10 rows, the smallest stateful query there
    is), so every epoch hands ``foreachBatch`` the FULL current
    histogram;
  * the sink recomputes the per-bucket PSI report from (baseline,
    current) and atomically overwrites ONE small parquet — a pure
    function of the complete aggregate, so epoch replay is idempotent
    by construction (the exactly-once argument needs no partition
    bookkeeping at all).

Scale: the only stream state is NBINS rows; the shuffle per epoch is
the map-side-combined bucket aggregate of that epoch's new files; the
report write is O(NBINS). A 100 TB/day stream bottlenecks on source
IO, never on this query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .windows import stream_to_batch_sink

# events.value spans ~[0, 490]; fixed literal edges, 10 buckets.
DRIFT_NBINS = 10
DRIFT_WIDTH = 50.0
DRIFT_EPS = 0.5
# Baseline = the first half of the events window.
BASELINE_END_EXCL = "2024-01-16"


def _bucket(col: str):
    return F.least(
        F.floor(F.col(col) / F.lit(DRIFT_WIDTH)), F.lit(DRIFT_NBINS - 1)
    ).cast("int")


def baseline_histogram(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    """(bucket, count) rows of the frozen baseline window — the model
    artifact the stream is compared against."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit(BASELINE_END_EXCL).cast("timestamp")
    )
    rows = (
        e.select(_bucket("value").alias("bucket"))
        .groupBy("bucket")
        .count()
        .collect()
    )
    return sorted((int(r.bucket), int(r["count"])) for r in rows)


def streaming_value_histogram(events_stream: DataFrame) -> DataFrame:
    """The running 10-row bucket aggregate (use outputMode='complete')."""
    return (
        events_stream.select(_bucket("value").alias("bucket"))
        .groupBy("bucket")
        .count()
    )


def psi_report(
    spark: SparkSession,
    baseline: list[tuple[int, int]],
    current_hist: DataFrame,
) -> DataFrame:
    """Per-bucket PSI of current vs baseline — ml/monitoring.py's
    smoothing and term formula, over two tiny histograms."""
    base_df = spark.createDataFrame(
        baseline, "bucket int, base_n long"
    )
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
    from pyspark.sql import Window

    w = Window.partitionBy()
    smooth = F.lit(DRIFT_EPS * DRIFT_NBINS)
    p_base = (F.col("base_n") + F.lit(DRIFT_EPS)) / (
        F.sum("base_n").over(w) + smooth
    )
    p_curr = (F.col("curr_n") + F.lit(DRIFT_EPS)) / (
        F.sum("curr_n").over(w) + smooth
    )
    term = (p_base - p_curr) * F.log(p_base / p_curr)
    return joined.select(
        "bucket",
        "base_n",
        "curr_n",
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(w), 6).alias("psi_total"),
    )


def maintain_drift_psi(
    spark: SparkSession,
    events_stream: DataFrame,
    baseline: list[tuple[int, int]],
    report_path: str,
    checkpoint: str | None = None,
):
    """Start the maintenance query: every epoch overwrites
    ``report_path`` with the PSI report of stream-so-far vs baseline."""
    hist = streaming_value_histogram(events_stream)

    def write_report(batch_df: DataFrame, epoch_id: int) -> None:
        psi_report(spark, baseline, batch_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(report_path)

    return stream_to_batch_sink(
        hist,
        write_report,
        query_name="drift-psi-maintenance",
        output_mode="complete",
        checkpoint=checkpoint,
    )
