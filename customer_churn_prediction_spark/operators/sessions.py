"""Batch sessionization of the event log (gap-based visits).

The streaming tier already sessionizes with
``F.session_window`` (streaming/windows.py); this is the BATCH twin a
feature pipeline runs over historical logs: split each user's event
stream into visits wherever the inter-event gap exceeds the timeout,
then aggregate per visit. Classic lag→flag→running-sum plan:

  1. one window per user ordered by (ts, event_id): the gap flag is
     ``lag(ts)`` versus the timeout (event_id breaks timestamp ties so
     the session numbering is total-order deterministic). The boundary
     is ``>=``: an event landing EXACTLY at prev_ts + gap starts a new
     session — the same exclusive-end rule ``F.session_window`` applies
     (see streaming/windows.py's session oracle), so the batch and
     streaming forms agree on boundary events;
  2. the running sum of flags IS the session number (one shuffle, by
     user);
  3. per-(user, session) hash aggregate — same key prefix as the
     window partitioning, so the aggregate reuses the shuffle.

Scale: the one real shuffle is keyed by user_id; a hot user serializes
only their own events (inherent to sessionization's order dependency
— the same bound the streaming form has). No joins, no collect.

Staged query surface (registry candidate for a later round; driver
budget full in r5) — tests/test_sessions.py enforces oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..constants import EVENTS_END_EXCL, EVENTS_START

SESSION_GAP_MIN = 30

# Probability floor for NLL scoring (r13, ADVICE r12): the model's p
# is 6dp-rounded, so a rare transition with n/n_from < 5e-7 rounds to
# 0.0 — Spark's log(0) answers NULL (the transition silently dropped
# from nll_sum while still counted in n_transitions) and DuckDB's
# ln(0) raises OutOfRangeException. Flooring p at the 6dp grid's own
# resolution (1e-6) before the log keeps both engines total and
# identical; it is also the stupid-backoff score an UNSEEN transition
# earns under the store-served model (greatest(NULL, floor) = floor
# in BOTH engines — verified DuckDB semantics).
P_FLOOR = 1e-6


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, visit): bounds, event count, total value."""
    e = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(EVENTS_START).cast("timestamp"))
        & (F.col("ts") < F.lit(EVENTS_END_EXCL).cast("timestamp"))
    )
    return sessionize(e)


def _session_numbered(e: DataFrame, carry: list[str]) -> DataFrame:
    """The lag→flag→running-sum numbering over any (user_id, ts,
    event_id, ...) frame — ONE definition of the session boundary
    (the gap expression is bound here only, the decay-module
    shared-factor rule), shared by the visit aggregate and the
    transition model so the two cannot disagree on where a session
    starts. Returns user_id/ts/event_id + ``carry`` + session_seq."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                >= SESSION_GAP_MIN * 60
            ),
            1,
        )
        .otherwise(0)
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return e.select(
        "user_id", "ts", "event_id", *carry,
        F.sum(gap_flag).over(w_run).cast("long").alias("session_seq"),
    )


def sessionize(e: DataFrame) -> DataFrame:
    """Core plan over any (user_id, ts, event_id, value) frame."""
    numbered = _session_numbered(e, ["value"])
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SESSIONS_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE ts >= TIMESTAMP '{EVENTS_START}'
    AND ts <  TIMESTAMP '{EVENTS_END_EXCL}'
),
flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) >= {SESSION_GAP_MIN * 60}
         THEN 1 ELSE 0 END AS gap_flag
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
    CAST(sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY user_id, session_seq
"""

QUERIES = {"event_sessions": event_sessions}
ORACLES = {"event_sessions": SESSIONS_ORACLE}
# session_transitions joins them below after its definition (r12
# graduation — the slot was freed by retiring dedup_lsh_verified to
# dedup_recall_eval, which executes its full pipeline in both
# engines).


def session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session Markov model: P(next event_type | event_type) from within-visit bigrams.

    The first-order behavioral transition matrix (the classic
    clickstream model): within each gap-based visit, count adjacent
    (from_type → to_type) pairs and normalize per from-state. The
    feature tier's sequence ops (``user_event_sequences``,
    ``sequence_training_pairs``) consume raw order; this is the
    corpus-level MODEL over the same sessions — next-action
    prediction baseline, anomaly scoring (low-probability
    transitions), and funnel sanity checks from one small table.

    Session boundaries come from the SAME ``_session_numbered`` core
    as ``event_sessions`` (one definition of the gap rule), so the
    model can never disagree with the visit table. Transitions cross
    event boundaries only WITHIN a session — the last event of one
    visit does not feed the first of the next.

    Scale shape: one user-keyed window pass (the sessionization
    bound), a per-(user, session) lag — same clustering, no extra
    shuffle class — then a hash aggregate down to ≤ |event_type|²
    rows; the per-from-state normalization windows over that tiny
    frame. 6dp-rounded probabilities, (from, to) deterministic."""
    e = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(EVENTS_START).cast("timestamp"))
        & (F.col("ts") < F.lit(EVENTS_END_EXCL).cast("timestamp"))
    )
    return transitions_from_events(e)


def transitions_from_events(e: DataFrame) -> DataFrame:
    """The transition-model plan over any (user_id, ts, event_id,
    event_type) frame."""
    numbered = _session_numbered(e, ["event_type"])
    w_s = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    seq = numbered.select(
        F.lag("event_type").over(w_s).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    counts = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(w_from).cast("long").alias("n_from"),
        F.round(
            F.col("n") / F.sum("n").over(w_from), 6
        ).alias("p"),
    )


TRANSITIONS_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE ts >= TIMESTAMP '{EVENTS_START}'
    AND ts <  TIMESTAMP '{EVENTS_END_EXCL}'
),
flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) >= {SESSION_GAP_MIN * 60}
         THEN 1 ELSE 0 END AS gap_flag
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_id, event_type,
    CAST(sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM flagged
),
pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id, session_seq ORDER BY ts, event_id
         ) AS from_type,
         event_type AS to_type
  FROM numbered
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
       round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS p
FROM counts
"""

# r11: staged (the vocab precedent). r12: graduated — the visit-level
# Markov model carries its own driver row; staged split now empty.
QUERIES["session_transitions"] = session_transitions
ORACLES["session_transitions"] = TRANSITIONS_ORACLE


def session_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-visit anomaly score under the session transition model: mean NLL of the visit's transitions.

    The actuation of ``session_transitions`` (r12): score every visit
    by how SURPRISING its behavior is under the corpus-level Markov
    model — mean negative log-probability of its within-visit
    transitions, the sequence analog of ``text_logprob``'s per-doc
    perplexity proxy. High scores are visits made of low-probability
    transitions (bot probing, broken funnels, fraud-shaped paths);
    the score is the standard ranking axis for behavioral anomaly
    review queues.

    Session boundaries and the model come from the SAME
    ``_session_numbered`` core and the SAME normalization expressions
    as the registered ops (one gap rule, one model), so the three
    views of a visit — its row in ``event_sessions``, its transitions
    in the model, its score here — can never disagree.

    Scale shape: the sessionization window (the tier's one shuffle
    class) + a broadcast join against the ≤ |event_type|² model + a
    per-visit hash aggregate. Float discipline (the bigram-LM
    lesson): per-transition NLLs are 6dp-rounded, the per-visit SUM
    is rounded BEFORE the mean divides it, and ``abs`` normalizes the
    IEEE -0.0 a p=1.0-only visit would emit — both engines fold to
    identical doubles. Per-transition p is floored at ``P_FLOOR``
    before the log (a 6dp-rounded p can be exactly 0.0 — see the
    constant), so the score is total over any corpus skew. Visits
    with a single event have no transitions and emit nothing (honest,
    asserted in tests).

    Columns: user_id, session_seq, n_transitions, n_unseen, nll_sum,
    mean_nll (``n_unseen`` is 0 here by construction — the model is
    fit on the same events; it is live on the store-served path)."""
    e = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(EVENTS_START).cast("timestamp"))
        & (F.col("ts") < F.lit(EVENTS_END_EXCL).cast("timestamp"))
    )
    model = transitions_from_events(e).select(
        "from_type", "to_type", "p"
    )
    return score_visits_against(e, model)


def score_visits_against(e: DataFrame, model: DataFrame) -> DataFrame:
    """The visit-scoring tail over any (user_id, ts, event_id,
    event_type) frame and any (from_type, to_type, p) model — ONE
    definition shared by the inline op (model refit per call) and the
    maintained-store serve (``streaming/transitions.py``'s
    ``visit_anomaly_report`` scores against ``current_transitions``),
    so the two paths cannot drift.

    r13 (VERDICT r12 #3): the model join is a LEFT join with a
    stupid-backoff floor — a transition the model has never seen
    scores ``-log(P_FLOOR)`` instead of silently vanishing from the
    visit's sum (the old inner join shrank ``n_transitions`` and let
    ``mean_nll`` read as if the visit were fully scored when the
    store had ingested only a subset of the scored events). The
    ``n_unseen`` column makes partial model coverage visible to
    consumers; it is exactly 0 whenever the model covers the events
    (the inline op always; the store after a superset ingest)."""
    numbered = _session_numbered(e, ["event_type"])
    w_s = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    pairs = numbered.select(
        "user_id",
        "session_seq",
        F.lag("event_type").over(w_s).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    # LEFT join + floor: every transition scores (seen → -log(p),
    # unseen or rounded-to-zero p → -log(P_FLOOR)); greatest() eats
    # the NULL identically in Spark and DuckDB
    scored = pairs.join(
        F.broadcast(model), ["from_type", "to_type"], "left"
    )
    nll = F.abs(
        F.round(-F.log(F.greatest(F.col("p"), F.lit(P_FLOOR))), 6)
    )
    agg = scored.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum(F.when(F.col("p").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unseen"),
        F.abs(F.round(F.sum(nll), 6)).alias("nll_sum"),
    )
    return agg.select(
        "user_id",
        "session_seq",
        "n_transitions",
        "n_unseen",
        "nll_sum",
        F.round(
            F.col("nll_sum") / F.col("n_transitions"), 6
        ).alias("mean_nll"),
    )


ANOMALY_ORACLE = f"""
WITH model AS ({TRANSITIONS_ORACLE}),
e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE ts >= TIMESTAMP '{EVENTS_START}'
    AND ts <  TIMESTAMP '{EVENTS_END_EXCL}'
),
flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) >= {SESSION_GAP_MIN * 60}
         THEN 1 ELSE 0 END AS gap_flag
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_id, event_type,
    CAST(sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM flagged
),
pairs AS (
  SELECT user_id, session_seq,
         lag(event_type) OVER (
           PARTITION BY user_id, session_seq ORDER BY ts, event_id
         ) AS from_type,
         event_type AS to_type
  FROM numbered
),
scored AS (
  SELECT p.user_id, p.session_seq,
         abs(round(-ln(greatest(m.p, {P_FLOOR!r})), 6)) AS nll,
         CASE WHEN m.p IS NULL THEN 1 ELSE 0 END AS unseen
  FROM pairs p LEFT JOIN model m
    ON m.from_type = p.from_type AND m.to_type = p.to_type
  WHERE p.from_type IS NOT NULL
),
agg AS (
  SELECT user_id, session_seq,
         CAST(count(*) AS BIGINT) AS n_transitions,
         CAST(sum(unseen) AS BIGINT) AS n_unseen,
         abs(round(sum(nll), 6)) AS nll_sum
  FROM scored GROUP BY 1, 2
)
SELECT user_id, session_seq, n_transitions, n_unseen, nll_sum,
       round(nll_sum / CAST(n_transitions AS DOUBLE), 6) AS mean_nll
FROM agg
"""

# r12 (second batch): the anomaly actuation stays staged under the
# 100-slot registry ceiling — driver-rigor parity in
# tests/test_session_anomaly.py + STAGED_CORRECTNESS.json.
STAGED_QUERIES: dict = {"session_anomaly": session_anomaly}
STAGED_ORACLES: dict = {"session_anomaly": ANOMALY_ORACLE}
