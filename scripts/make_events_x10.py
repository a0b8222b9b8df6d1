"""Generate a 10x events table for the sketch-tier scale point.

sf0.1's events replicated 10x with per-replica ID OFFSETS on both
user_id (+ k * 1_000_000) and event_id: row count AND key cardinality
grow 10x together — the stress direction for a count-min sketch,
whose collision mass per bucket grows with distinct keys while its
error band (e/w * N) grows with N. Each user keeps its original event
count, so the exact top-K per replica is the original top-K shifted —
output size stays K by construction and any runtime growth is
compute. Replica 0 is the original table byte-for-byte.

Writes /root/repo/.scale/sf1events/events.parquet (~10x sf0.1).
Deterministic: pure column arithmetic, no randomness.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/events.parquet"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale", "sf1events",
)
N_REPLICAS = 10
USER_OFFSET = 1_000_000
EVENT_OFFSET = 100_000_000


def main() -> None:
    src = pq.read_table(SRC)
    parts = []
    for k in range(N_REPLICAS):
        t = src
        if k:
            t = t.set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pc.add(t["user_id"], k * USER_OFFSET),
            )
            t = t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pc.add(t["event_id"], k * EVENT_OFFSET),
            )
        parts.append(t)
    out = pa.concat_tables(parts)
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(out, os.path.join(OUT_DIR, "events.parquet"))
    print(f"wrote {out.num_rows} rows to {OUT_DIR}/events.parquet")


if __name__ == "__main__":
    main()
