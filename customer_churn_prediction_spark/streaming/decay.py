"""Streaming decayed counters: half-life engagement features
maintained on event ingest.

``operators/decay.py::user_decay_features`` computes the half-life
sums in one batch pass anchored at the corpus max ts; a feature store
maintains them as events arrive with the classic DECAYED-COUNTER
algebra: when the anchor advances from A₁ to A₂, every existing sum
rescales by the SAME factor 0.5^((A₂−A₁)/H) (exponentials turn
per-event re-aging into one multiplication), then the epoch's own
contribution — computed at A₂ with the batch op's exact per-event
discipline — adds on. Per-user state is ONE row (count, last ts,
decayed count, decayed value, anchor): constant in history size.

Exactly-once under replay: read-modify-write state is not naturally
idempotent, so each epoch writes a FULL per-user snapshot into its
own ``epoch_id`` snapshot partition (dynamic partition overwrite),
computed from the LATEST snapshot strictly below it — a replayed
epoch re-reads the same predecessor and overwrites its own partition
with the same rows. ``compact`` keeps only the newest snapshot;
``rebuild`` recomputes from a scrubbed source (a decayed sum cannot
subtract one user's events in place).

Equality contract (the GK-family band precedent, not bit equality):
the batch op rounds each event's weight at the FINAL anchor; the
stream rounded it at its EPOCH's anchor and then rescaled by an
exact factor, so the two differ by at most the 6dp per-event
rounding (5e-7) carried through the rescale — |maintained − batch|
≤ 1e-6 · n_events per user, asserted in
tests/test_streaming_decay.py. Everything integer (counts, last ts)
is exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decay import HALF_LIFE_DAYS, _US_PER_DAY
from .windows import stream_to_batch_sink

STATE_SUBDIR = "decay_snapshots"

_STATE_SCHEMA = (
    "user_id bigint, n_events bigint, last_ts timestamp, "
    "dc double, dv double, anchor timestamp"
)


def _epoch_contribution(events: DataFrame, anchor_col) -> DataFrame:
    """The batch op's exact per-event discipline over one epoch,
    expressed at ``anchor_col``: 6dp-rounded weights and weighted
    values, summed per user."""
    t = events.select(
        "user_id",
        "value",
        "ts",
        (F.unix_micros(anchor_col) - F.unix_micros(F.col("ts"))).alias(
            "dmic"
        ),
    )
    w = F.round(
        F.pow(
            F.lit(0.5),
            (F.col("dmic") / F.lit(_US_PER_DAY))
            / F.lit(HALF_LIFE_DAYS),
        ),
        6,
    )
    t = t.select(
        "user_id",
        "ts",
        w.alias("w"),
        F.round(F.col("value") * w, 6).alias("wv"),
    )
    return t.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("ts").alias("last_ts"),
        F.sum("w").alias("dc"),
        F.sum("wv").alias("dv"),
    )


def latest_state(spark: SparkSession, store_dir: str) -> DataFrame:
    """The current per-user state: the newest stored snapshot. A
    store with no epochs yet answers the typed empty frame."""
    path = os.path.join(store_dir, STATE_SUBDIR)
    if not os.path.isdir(path):
        return spark.createDataFrame([], _STATE_SCHEMA)
    snaps = spark.read.parquet(path)
    latest = snaps.agg(F.max("epoch_id")).collect()[0][0]
    return snaps.where(
        F.col("epoch_id") == F.lit(latest)
    ).select("user_id", "n_events", "last_ts", "dc", "dv", "anchor")


def _state_before(
    spark: SparkSession, store_dir: str, epoch_id: int
) -> DataFrame:
    """The newest snapshot strictly below ``epoch_id`` — what a
    (possibly replayed) epoch must build on."""
    path = os.path.join(store_dir, STATE_SUBDIR)
    if not os.path.isdir(path):
        return spark.createDataFrame([], _STATE_SCHEMA)
    snaps = spark.read.parquet(path).where(
        F.col("epoch_id") < F.lit(epoch_id)
    )
    prev = snaps.agg(F.max("epoch_id")).collect()[0][0]
    if prev is None:
        return spark.createDataFrame([], _STATE_SCHEMA)
    return snaps.where(
        F.col("epoch_id") == F.lit(prev)
    ).select("user_id", "n_events", "last_ts", "dc", "dv", "anchor")


def features(spark: SparkSession, store_dir: str) -> DataFrame:
    """The serving view, column-for-column the batch op's schema:
    (user_id, n_events, last_event_age_days, decayed_count,
    decayed_value) at the maintained anchor."""
    s = latest_state(spark, store_dir)
    return s.select(
        "user_id",
        "n_events",
        F.round(
            (F.unix_micros("anchor") - F.unix_micros("last_ts"))
            / F.lit(_US_PER_DAY),
            6,
        ).alias("last_event_age_days"),
        F.round("dc", 6).alias("decayed_count"),
        F.round("dv", 6).alias("decayed_value"),
    )


def maintain_decay(
    spark: SparkSession,
    events_stream: DataFrame,
    store_dir: str,
    checkpoint: str | None = None,
    fault=None,
):
    """Start the maintenance query (append semantics; needs user_id,
    ts, value). Each epoch: advance the anchor to max(prev anchor,
    epoch max ts), rescale the previous snapshot by the one shared
    decay factor, add the epoch's contribution, write the new full
    snapshot into this epoch's partition."""
    state_path = os.path.join(store_dir, STATE_SUBDIR)

    def epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        if batch.isEmpty():
            return
        prev = _state_before(spark, store_dir, epoch_id)
        batch_max = batch.agg(F.max("ts")).collect()[0][0]
        prev_anchor_row = prev.agg(F.max("anchor")).collect()[0][0]
        anchor = (
            batch_max
            if prev_anchor_row is None
            else max(batch_max, prev_anchor_row)
        )
        contrib = _epoch_contribution(batch, F.lit(anchor))
        # one shared rescale factor — exact arithmetic on the stored
        # doubles, no per-event re-rounding
        aged = prev.select(
            "user_id",
            "n_events",
            "last_ts",
            (
                F.col("dc")
                * F.pow(
                    F.lit(0.5),
                    (
                        (
                            F.unix_micros(F.lit(anchor))
                            - F.unix_micros(F.col("anchor"))
                        )
                        / F.lit(_US_PER_DAY)
                    )
                    / F.lit(HALF_LIFE_DAYS),
                )
            ).alias("dc"),
            (
                F.col("dv")
                * F.pow(
                    F.lit(0.5),
                    (
                        (
                            F.unix_micros(F.lit(anchor))
                            - F.unix_micros(F.col("anchor"))
                        )
                        / F.lit(_US_PER_DAY)
                    )
                    / F.lit(HALF_LIFE_DAYS),
                )
            ).alias("dv"),
        )
        merged = (
            aged.select(
                "user_id", "n_events", "last_ts", "dc", "dv"
            )
            .unionByName(
                contrib.select(
                    "user_id", "n_events", "last_ts", "dc", "dv"
                )
            )
            .groupBy("user_id")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.max("last_ts").alias("last_ts"),
                F.sum("dc").alias("dc"),
                F.sum("dv").alias("dv"),
            )
            .withColumn("anchor", F.lit(anchor))
        )
        (
            merged.withColumn("epoch_id", F.lit(epoch_id))
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(state_path)
        )
        if fault is not None:
            fault(epoch_id)

    return stream_to_batch_sink(
        events_stream,
        epoch,
        query_name="decay-maintenance",
        output_mode="append",
        checkpoint=checkpoint,
    )


def compact(spark: SparkSession, store_dir: str, upto_epoch: int) -> None:
    """Keep only the newest snapshot with ``epoch_id <=
    upto_epoch`` (re-labeled as the base partition) plus any newer
    epochs — old snapshots exist only for replay determinism and fold
    away. Shared staged-swap crash discipline."""
    from .maintenance import staged_swap

    state_path = os.path.join(store_dir, STATE_SUBDIR)

    def _write(stage: str) -> None:
        snaps = spark.read.parquet(state_path)
        upto = snaps.where(
            F.col("epoch_id") <= F.lit(upto_epoch)
        )
        latest = upto.agg(F.max("epoch_id")).collect()[0][0]
        keep = snaps.where(F.col("epoch_id") > F.lit(upto_epoch))
        base = (
            upto.where(F.col("epoch_id") == F.lit(latest))
            .withColumn("epoch_id", F.lit(-1))
            if latest is not None
            else upto
        )
        (
            base.unionByName(keep)
            .repartition("epoch_id")
            .write.mode("overwrite")
            .partitionBy("epoch_id")
            .parquet(stage)
        )

    staged_swap(state_path, _write)


def rebuild(
    spark: SparkSession, store_dir: str, clean_events: DataFrame
) -> None:
    """Erasure (a decayed sum cannot subtract one user's events in
    place): recompute the snapshot from the scrubbed events source at
    ITS anchor and staged-swap it in as the base epoch."""
    import shutil

    from .maintenance import staged_swap

    state_path = os.path.join(store_dir, STATE_SUBDIR)
    if not os.path.isdir(state_path):
        raise FileNotFoundError(
            f"rebuild: no store at {state_path} — nothing to rebuild"
        )
    anchor = clean_events.agg(F.max("ts")).collect()[0][0]
    if anchor is None:
        # scrub removed every event: the truthful state is "never
        # ingested" (the rebuild_base empty-store rule)
        shutil.rmtree(state_path)
        return
    state = _epoch_contribution(
        clean_events.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        ),
        F.lit(anchor),
    ).withColumn("anchor", F.lit(anchor))

    def _write(stage: str) -> None:
        (
            state.select(
                "user_id", "n_events", "last_ts", "dc", "dv", "anchor"
            )
            .withColumn("epoch_id", F.lit(-1))
            .repartition("epoch_id")
            .write.mode("overwrite")
            .partitionBy("epoch_id")
            .parquet(stage)
        )

    staged_swap(state_path, _write)
