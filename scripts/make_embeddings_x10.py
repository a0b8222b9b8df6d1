"""Generate a 10x embeddings corpus for the ANN tier's 4th
scale-curve point — the embeddings analog of make_docs_x10.py.

sf0.1's embeddings table (2 000 × 64-dim float) replicated 10x with a
per-replica SIGNED DIMENSION PERMUTATION: permuting coordinates and
flipping signs is an orthogonal transform, so every within-replica
dot product / norm / cosine is EXACTLY preserved (the same float
terms, reordered/negated — bit-equal sums under the engines'
left-to-right folds is not required, only value-equal similarity
structure), while the cosine between vectors of DIFFERENT replicas
collapses to chance. True neighbors therefore stay within-replica BY
CONSTRUCTION: per-query top-k output is constant while the candidate
corpus grows 10x, so any super-linear runtime growth on this input is
compute/shuffle-driven, not result volume (SCALE.md §10; VERDICT r4
item 4).

vec_ids offset by k * 10_000_000 — replica 0 is the original corpus
byte-for-byte, so the fixed query set (vec_id < 5) and the fixed IVF
seed centroids (vec_id in [100, 108)) keep reading original vectors.

Writes /root/repo/.scale/sf1emb/embeddings.parquet.
Deterministic: permutations/signs from a fixed-seed RNG.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale", "sf1emb",
)
N_REPLICAS = 10
ID_OFFSET = 10_000_000


def main() -> None:
    t = pq.read_table(SRC)
    vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    label = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    n, dim = emb.shape

    ids_out, emb_out, lab_out = [], [], []
    for k in range(N_REPLICAS):
        if k == 0:
            rep = emb
        else:
            rng = random.Random(20260813 * 1000 + k)
            perm = list(range(dim))
            rng.shuffle(perm)
            signs = np.asarray(
                [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)],
                dtype=np.float32,
            )
            rep = emb[:, perm] * signs
        ids_out.append(vec_id + k * ID_OFFSET)
        emb_out.append(rep)
        lab_out.append(label)

    ids = np.concatenate(ids_out)
    vecs = np.concatenate(emb_out)
    labs = np.concatenate(lab_out)

    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(
        pa.table(
            {"vec_id": pa.array(ids), "embedding": arr,
             "label": pa.array(labs)},
        ),
        os.path.join(OUT_DIR, "embeddings.parquet"),
        row_group_size=50_000,
    )
    print(f"wrote {len(ids)} vectors to {OUT_DIR}")


if __name__ == "__main__":
    main()
