"""Time-window operators over the `events` stream table.

The reference only *declares* streaming intent (Kafka/Redis deps at
``GBDT/spark/pom.xml:96-132``; no code). Per the north star we
implement the Structured Streaming surface over `events`:
tumbling / sliding / session windows, watermarking, and
drop-duplicates. Each operator has a deterministic BATCH form here
(oracle-checked against DuckDB) and a STREAMING form built by
``as_stream`` + the helpers in this module (smoke-tested in
``tests/test_streaming.py``; Structured Streaming's incremental
execution of an aggregation produces the same result set as the batch
plan by construction).

Timestamps are emitted as formatted strings (micro-precision where
relevant) so both engines transport identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: event counts + value sums per type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour size, 30 min slide): each event lands in
    size/slide = 2 windows, epoch-aligned."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "n_events",
        )
    )


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via
    ``F.session_window`` — session end = last event + gap."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT_US).alias("session_start"),
            F.date_format("w.end", _TS_FMT_US).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a business key — the batch form of streaming
    ``dropDuplicatesWithinWatermark``. Keeps one row per
    (user_id, event_type, minute-bucket)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("minute", F.col("ts"))
    return (
        e.withColumn("minute_bucket", bucket)
        .groupBy("user_id", "event_type", "minute_bucket")
        .agg(
            F.min("event_id").alias("event_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(
            "user_id",
            "event_type",
            F.date_format("minute_bucket", _TS_FMT).alias("minute_bucket"),
            "event_id",
            "n_dups",
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming forms (smoke-tested; not oracle-gated — the driver
# contract is batch DataFrames).


def as_stream(spark: SparkSession, parquet_dir: str, schema) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(parquet_dir)


# The Kafka source's fixed wire schema (spark-sql-kafka contract).
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)

_EVENT_PAYLOAD_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def events_from_kafka_records(raw: DataFrame) -> DataFrame:
    """The value-parsing projection between a Kafka-wire frame and the
    events shape every operator in this module consumes: JSON payload
    in ``value``, event time from the PAYLOAD (``ts``), never from the
    broker append time — a replayed/compacted topic re-stamps
    ``timestamp`` but must not move the windows. Takes ANY frame with
    the connector's wire schema (``KAFKA_WIRE_SCHEMA``), batch or
    stream, so the parse contract is testable without a broker."""
    payload = F.from_json(
        F.col("value").cast("string"), _EVENT_PAYLOAD_SCHEMA
    )
    return raw.select(
        F.col("timestamp").alias("kafka_ts"), payload.alias("e")
    ).select(
        "e.event_id", "e.ts", "e.user_id", "e.event_type", "e.value", "e.props"
    )


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S14: the Kafka connector the reference declares but never uses
    (GBDT/spark/pom.xml:96-114). Emits the same (ts, user_id,
    event_type, value, props) shape as the events table so every
    operator in this module runs unchanged on a live topic. The
    source construction requires the spark-sql-kafka package on the
    classpath and a broker — neither is in this container — but the
    entire transformation below ``.load()``
    (:func:`events_from_kafka_records`) IS exercised end-to-end in
    tests over a stream carrying the connector's exact wire schema."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return events_from_kafka_records(raw)


def streaming_tumbling_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling aggregation — late rows beyond 10 minutes
    are dropped; state is bounded, safe to run indefinitely at scale."""
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def streaming_dedup(events_stream: DataFrame) -> DataFrame:
    """Streaming dropDuplicates within the watermark horizon."""
    return events_stream.withWatermark("ts", "10 minutes").dropDuplicates(
        ["user_id", "event_type", "ts"]
    )


def stream_to_batch_sink(result: DataFrame, batch_fn, query_name: str,
                         output_mode: str = "update",
                         checkpoint: str | None = None):
    """foreachBatch bridge: reuse any BATCH sink (JDBC, salted export,
    bucketed table — sources/writers.py) as a streaming sink. Spark
    hands each micro-batch to ``batch_fn(df, epoch_id)``; exactly-once
    needs the sink to be idempotent on epoch_id (e.g. overwrite a
    per-epoch partition), which is the standard contract.

    Pass ``checkpoint`` for a durable run: a restarted query with the
    same checkpoint resumes from committed offsets with its
    aggregation state restored (crash-resume is exercised in
    tests/test_streaming.py); without it Spark uses a temp checkpoint
    that dies with the query."""
    writer = (
        result.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .queryName(query_name)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, value,
         -- >= : Spark's session end bound is exclusive (an event landing
         -- exactly at prev_ts + gap starts a NEW session)
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS value_sum
FROM sessions
GROUP BY user_id, session_id
"""

QUERIES = {
    "stream_tumbling_counts": tumbling_counts,
    "stream_sliding_counts": sliding_counts,
    "stream_session_windows": session_windows,
    "stream_dedup_events": dedup_events,
}

ORACLES = {
    "stream_tumbling_counts": """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 2) AS value_sum
FROM events GROUP BY 1, 2
""",
    "stream_sliding_counts": """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events
FROM assigned GROUP BY 1
""",
    "stream_session_windows": _SESSION_ORACLE,
    "stream_dedup_events": """
SELECT user_id, event_type,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute_bucket,
       min(event_id) AS event_id, count(*) AS n_dups
FROM events GROUP BY user_id, event_type, date_trunc('minute', ts)
""",
}
