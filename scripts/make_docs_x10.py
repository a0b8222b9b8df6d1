"""Generate a 10x documents corpus for the 4th scale-curve point.

sf0.1's documents table (5 000 docs) replicated 10x with a per-replica
CHARACTER SUBSTITUTION CIPHER on [a-z0-9]: a bijective char map
preserves every within-replica shingle/gram overlap EXACTLY (set sizes
and intersections are invariant under a bijection of the alphabet),
while cross-replica overlap collapses to chance — so the corpus's
near-dup structure replicates linearly BY CONSTRUCTION (output rows
grow ~10x, never quadratically). Any super-linear runtime on this
input is therefore compute-driven, which is precisely what the 4th
point is meant to separate from output-volume growth
(SCALE.md §10; VERDICT r3 item 5).

doc_ids are offset by k * 10 000 000 (a multiple of 10, so the
doc_id % 10 incremental batch/corpus split keeps the same 80/20
proportions). Replica 0 is the original corpus byte-for-byte.

Writes /root/repo/.scale/sf1docs/documents.parquet (~10x sf0.1).
Deterministic: the ciphers come from a fixed-seed Fisher-Yates.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale", "sf1docs",
)
N_REPLICAS = 10
ID_OFFSET = 10_000_000  # multiple of INCREMENTAL_MOD


def cipher_table(k: int) -> dict[int, int] | None:
    """Bijective map over [a-z] and [0-9] for replica k (identity for
    k=0). Seeded per replica — deterministic across runs."""
    if k == 0:
        return None
    rng = random.Random(20260813 * 1000 + k)
    letters = list("abcdefghijklmnopqrstuvwxyz")
    digits = list("0123456789")
    lp = letters[:]
    rng.shuffle(lp)
    dp = digits[:]
    rng.shuffle(dp)
    return str.maketrans(
        "".join(letters) + "".join(digits), "".join(lp) + "".join(dp)
    )


def main() -> None:
    t = pq.read_table(SRC)
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    n_chars = t.column("n_chars").to_pylist()

    out = {"doc_id": [], "text": [], "lang": [], "source": [],
           "n_chars": []}
    for k in range(N_REPLICAS):
        tr = cipher_table(k)
        out["doc_id"].extend(i + k * ID_OFFSET for i in doc_id)
        out["text"].extend(
            s if tr is None or s is None else s.translate(tr) for s in text
        )
        out["lang"].extend(lang)
        out["source"].extend(source)
        out["n_chars"].extend(n_chars)

    os.makedirs(OUT_DIR, exist_ok=True)
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("source", pa.string()),
        ("n_chars", pa.int64()),
    ])
    pq.write_table(
        pa.table(out, schema=schema),
        os.path.join(OUT_DIR, "documents.parquet"),
        row_group_size=50_000,
    )
    print(f"wrote {len(out['doc_id'])} docs to {OUT_DIR}")


if __name__ == "__main__":
    main()
