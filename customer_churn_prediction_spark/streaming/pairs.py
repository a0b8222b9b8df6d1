"""Continuous training-pair generation — the streaming twin of
``operators.sampling.sequence_training_pairs``.

A batch dataloader regenerates every (context, next-item) example
from the full log on each run; at 100 TB the log rescan dominates.
The streaming form keeps the last ``W_CTX`` items per user as custom
state and, as each purchase arrives, emits exactly the NEW training
example it creates (its context = the state at arrival), then folds
the item into state. Downstream this feeds the same continuous
export path the repo already ships (event stream → projection →
tfrecord epoch shards): a model can consume fresh supervised
examples without ever rescanning history.

Scale notes, same discipline as ``streaming/stateful.py``:

* State is BOUNDED — ``W_CTX`` ints plus one counter per user,
  independent of event volume (the unbounded alternative, keeping
  every event, is the applyInPandasWithState anti-pattern).
* The only shuffle is the hash partition on user_id the stateful
  operator needs anyway; the Python crossing is Arrow-batched.
* Each arriving event yields at most one output row, so emitted
  volume tracks ingest volume, never state size.

Equivalence contract (asserted in tests/test_streaming_pairs.py):
with events delivered in (ts, event_id) order across micro-batches —
intra-batch order is restored by an explicit sort inside the update
fn — the union of emitted pairs over all epochs equals the batch
operator's output exactly, each pair exactly once, including across
a stop/checkpoint-resume. Delivery to an at-rest store stays
exactly-once the same way the repo's other continuous sinks do it:
an epoch-keyed idempotent writer (see ``sources/tfrecord_datasource``
/ ``streaming/rollup``), not this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import W_CTX
from ..operators.sampling import project_purchases as _project_purchases

_OUT_SCHEMA = (
    "user_id long, pos long, target_item int, context string, "
    "ctx_len int"
)
_STATE_SCHEMA = "pos long, items array<int>"


def _pairs_update(key, pdf_iter, state: GroupState):
    import pandas as pd  # local import: runs inside the Arrow worker

    if state.exists:
        pos, items = state.get
        items = list(items)
    else:
        pos, items = 0, []
    arrived = []
    for pdf in pdf_iter:
        # Raw int64 ticks: only used as a sort key, so the pandas
        # datetime unit (ns vs us) is irrelevant as long as it is
        # monotone — dividing to a fixed unit would collapse ties
        # differently per unit.
        ticks = pdf["ts"].astype("int64").tolist()
        arrived.extend(
            zip(ticks, pdf["event_id"].tolist(), pdf["item"].tolist())
        )
    # Same order contract as the batch window: (ts, event_id) ASC.
    arrived.sort()
    out = []
    for _, _, item in arrived:
        item = int(item)
        pos += 1
        if items:
            out.append(
                (
                    key[0], pos, item,
                    "|".join(str(x) for x in items), len(items),
                )
            )
        items = (items + [item])[-W_CTX:]
    state.update((pos, items))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "pos", "target_item", "context", "ctx_len",
            ],
        )


# THE shared batch/stream projection lives with the batch op so the
# twins cannot drift; re-exported here for the stream-side callers.
project_purchases = _project_purchases


def streaming_sequence_pairs(events_stream: DataFrame) -> DataFrame:
    """New (context, next-item) examples per micro-batch, from the
    raw events stream."""
    return (
        project_purchases(events_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            _pairs_update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            # append, not update: every emitted row is a NEW example
            # (a pair is never revised), which is also what lets the
            # append-only tfrecord stream sink consume this directly.
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
