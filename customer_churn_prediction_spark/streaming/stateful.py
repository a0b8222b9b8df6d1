"""Custom stateful streaming: per-user running totals via
``applyInPandasWithState``.

The sanctioned escape hatch for operators Structured Streaming's
built-in windows can't express (SURVEY §2.9/§2.10): arbitrary per-key
state updated Arrow-batch-at-a-time. The batch form (``user_totals``)
is plain groupBy — oracle-checked; the streaming form is smoke-tested
to converge to it (tests/test_streaming.py).

Scale notes: state is one (count, sum) pair per user — O(keys) memory
in the state store, no per-event retention; Arrow transfer batches the
Python crossing, and the shuffle is the same single hash partition on
user_id the batch aggregate needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load_table

_OUT_SCHEMA = "user_id long, n_events long, value_sum double"
_STATE_SCHEMA = "n long, s double"


def user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent form: per-user event count + value sum."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def _update(key, pdf_iter, state: GroupState):
    import pandas as pd  # local import: runs inside the Arrow worker

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 2)]}
    )


def streaming_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming form: emits the running (count, sum) per user on every
    micro-batch containing that user."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SEQ_OUT_SCHEMA = "user_id long, seq_len long, seq string"
_SEQ_STATE_SCHEMA = (
    "ts array<long>, ids array<long>, types array<string>"
)


def _seq_update(key, pdf_iter, state: GroupState):
    import pandas as pd  # local import: runs inside the Arrow worker

    from ..operators.windows import SEQ_LEN

    if state.exists:
        ts, ids, types = state.get
        rows = list(zip(ts, ids, types))
    else:
        rows = []
    for pdf in pdf_iter:
        micros = (pdf["ts"].astype("int64") // 1000).tolist()
        rows.extend(zip(micros, pdf["event_id"].tolist(),
                        pdf["event_type"].tolist()))
    # Keep the top-K by (ts, event_id) DESC — identical order contract
    # to the batch window's row_number.
    rows = sorted(rows, key=lambda r: (r[0], r[1]), reverse=True)[:SEQ_LEN]
    state.update((
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows],
    ))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "seq_len": [len(rows)],
            "seq": ["|".join(r[2] for r in rows)],
        }
    )


def streaming_user_sequences(events_stream: DataFrame) -> DataFrame:
    """Streaming form of ``operators.windows.user_event_sequences``:
    the last-K per-user event sequence maintained as custom state and
    re-emitted whenever a micro-batch touches the user — a continual
    dataloader feed (the serving side reads fresh training sequences
    without rescanning the log).

    State is EXACTLY K (ts, id, type) triples per user — bounded by
    the sequence length, not the event volume, which is what makes
    per-key custom state viable at 100 TB of events (the unbounded
    alternative, keeping every event, is the anti-pattern
    applyInPandasWithState invites). Convergence to the batch window
    form is asserted in tests/test_streaming.py."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _seq_update,
        outputStructType=_SEQ_OUT_SCHEMA,
        stateStructType=_SEQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QUERIES = {
    "stream_user_totals": user_totals,
}

ORACLES = {
    "stream_user_totals": """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS value_sum
FROM events GROUP BY user_id
""",
}
