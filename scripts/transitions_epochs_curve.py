"""The two transitions-store terms the r12 decade table didn't bound
(VERDICT r12 item 4): serve-side partial growth with EPOCH COUNT
(before/after compaction), and the full-log re-read a BULK epoch pays
when it touches >= N_USER_BUCKETS buckets (static bucket pruning can
drop nothing).

Protocol per fixture (sf0.1, then the ×10 events fixture):

  * wave 0  — bulk A: user_id % 2 = 0 (touches all 64 buckets) into a
    near-empty store — the baseline bulk-epoch cost, no accumulated
    log to re-read;
  * waves 1-12 — twelve SMALL epochs (one odd user_id % 200 residue
    each, disjoint from bulk A and from each other) — after waves
    4 / 8 / 12 the serve (current_transitions full materialization)
    is timed, so the partial-count growth term is measured at 5, 9,
    and 13 stored epochs;
  * wave 13 — bulk B: the remaining odd users (all buckets again) —
    its wall minus bulk A's is the full-log re-read + extra-partials
    term at 13 accumulated epochs;
  * compact(upto=last) — serve re-timed against the folded base: the
    stated compaction cadence's payoff.

Usage: python scripts/transitions_epochs_curve.py (run ALONE — the
walls are meaningless under a concurrent Spark session).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from customer_churn_prediction_spark.session import get_spark  # noqa: E402
from customer_churn_prediction_spark.streaming import (  # noqa: E402
    transitions as stt,
)

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1/events.parquet"),
    ("x10", os.path.join(REPO, ".scale", "sf1events", "events.parquet")),
]
_SMALL_RESIDUES = [2 * k + 1 for k in range(12)]  # odd => disjoint from bulk A


def _serve_wall(spark, store: str) -> float:
    t0 = time.monotonic()
    stt.current_transitions(spark, store).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark(app_name="transitions-epochs-curve",
                      master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for tag, src in POINTS:
        events = spark.read.parquet(src)
        if dict(events.dtypes).get("ts") != "timestamp":
            events = events.withColumn("ts", F.col("ts").cast("timestamp"))
        small_pred = " OR ".join(
            f"user_id % 200 = {r}" for r in _SMALL_RESIDUES
        )
        waves = (
            [("bulkA", events.where("user_id % 2 = 0"))]
            + [
                (f"s{i}", events.where(f"user_id % 200 = {r}"))
                for i, r in enumerate(_SMALL_RESIDUES)
            ]
            + [
                (
                    "bulkB",
                    events.where(
                        f"user_id % 2 = 1 AND NOT ({small_pred})"
                    ),
                )
            ]
        )
        work = tempfile.mkdtemp(prefix=f"ttepochs_{tag}_")
        stream_dir = os.path.join(work, "arrivals")
        os.makedirs(stream_dir)
        store = os.path.join(work, "store")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = stt.maintain_transitions(
            spark, stream, store, checkpoint=os.path.join(work, "ckpt")
        )
        walls: dict[str, float] = {}
        serves: list[tuple[str, float]] = []
        for i, (name, w) in enumerate(waves):
            wave_dir = os.path.join(work, "wave")
            w.coalesce(1).write.mode("overwrite").parquet(wave_dir)
            for f in os.listdir(wave_dir):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(wave_dir, f),
                        os.path.join(stream_dir, f"{i}_{f}"),
                    )
            t0 = time.monotonic()
            q.processAllAvailable()
            walls[name] = time.monotonic() - t0
            if name in ("bulkA", "s3", "s7", "s11", "bulkB"):
                serves.append((f"after_{name}", _serve_wall(spark, store)))
        q.stop()
        n_partials = spark.read.parquet(
            os.path.join(store, stt.COUNTS_SUBDIR)
        ).count()
        stt.compact(spark, store, upto_epoch=len(waves) - 1)
        serves.append(("after_compact", _serve_wall(spark, store)))
        n_compacted = spark.read.parquet(
            os.path.join(store, stt.COUNTS_SUBDIR)
        ).count()
        small_walls = [walls[f"s{i}"] for i in range(12)]
        print(
            f"{tag}: bulkA={walls['bulkA']:.2f}s"
            f" bulkB={walls['bulkB']:.2f}s"
            f" (full-log re-read + 13-epoch partials term:"
            f" {walls['bulkB'] - walls['bulkA']:+.2f}s)\n"
            f"  small epochs walls="
            f"[{', '.join(f'{x:.2f}' for x in small_walls)}] s\n"
            f"  serve walls: "
            + "; ".join(f"{k}={v:.2f}s" for k, v in serves)
            + f"\n  count_partials before compact={n_partials},"
            f" after={n_compacted}"
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
