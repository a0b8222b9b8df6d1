"""Decade measurement for the streaming transitions store (the tenth
maintained-store family, r12): per-epoch wall vs touched users at
sf0.1 and the ×10 events fixture (`.scale/sf1events` — 10× events AND
10× users via per-replica id offsets).

The family's honest cost model has two terms per epoch:

  1. recompute ∝ Σ over TOUCHED users of |their history| (adjacency
     is order-sensitive — no aggregatable shortcut);
  2. the touched-user fetch: statically pruned to the touched
     (epoch, u_bucket) directories, then an exact user semi-join
     within them.

Waves are staged so both terms are visible:

  * wave 1 — the bulk (user_id % 10 != 3): a big epoch;
  * waves 2-3 — a FIXED set of replica-0 users (present identically
    in both fixtures), so across the ×10 step the touched term is
    CONSTANT and any small-epoch growth is the fetch term.

Prints per-epoch walls + touched-user counts + final store row
counts. Usage: python scripts/transitions_curve.py (run ALONE).
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
# replica-0 user slices — identical membership in both fixtures
_SMALL_A = "user_id % 100 = 51 AND user_id < 1000000"
_SMALL_B = "user_id % 100 = 61 AND user_id < 1000000"


def main() -> None:
    spark = get_spark(app_name="transitions-curve", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for tag, src in POINTS:
        events = spark.read.parquet(src)
        if dict(events.dtypes).get("ts") != "timestamp":
            events = events.withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        waves = [
            events.where(
                f"user_id % 10 != 3 AND NOT ({_SMALL_A})"
                f" AND NOT ({_SMALL_B})"
            ),
            events.where(_SMALL_A),
            events.where(_SMALL_B),
        ]
        work = tempfile.mkdtemp(prefix=f"ttcurve_{tag}_")
        stream_dir = os.path.join(work, "arrivals")
        os.makedirs(stream_dir)
        store = os.path.join(work, "store")
        ckpt = os.path.join(work, "ckpt")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = stt.maintain_transitions(spark, stream, store,
                                     checkpoint=ckpt)
        walls, touched = [], []
        for w in waves:
            n_users = w.select("user_id").distinct().count()
            wave_dir = os.path.join(work, "wave")
            # one file per wave => one micro-batch per wave (staging
            # is untimed)
            w.coalesce(1).write.mode("overwrite").parquet(wave_dir)
            for f in os.listdir(wave_dir):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(wave_dir, f),
                        os.path.join(
                            stream_dir, f"{len(walls)}_{f}"
                        ),
                    )
            t0 = time.monotonic()
            q.processAllAvailable()
            walls.append(time.monotonic() - t0)
            touched.append(n_users)
        q.stop()
        n_model = stt.current_transitions(spark, store).count()
        n_counts = spark.read.parquet(
            os.path.join(store, stt.COUNTS_SUBDIR)
        ).count()
        print(
            f"{tag}: per-epoch walls="
            f"[{', '.join(f'{w:.2f}' for w in walls)}] s"
            f" touched={touched} model_rows={n_model}"
            f" count_partials={n_counts}"
        )
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
