"""LibSVM codec validated against the reference's own golden pair
(SURVEY §5 item 3): LR/data/churn_train_sample.csv ↔
churn_train_sample.svm under LR/data/churn_featindex.txt, the loader
contract of FM/fm_libsvm/libsvm_transform.py:11-24.

The reference maps each categorical cell through the featindex
dictionary (``"<col_idx>:<value>" -> slot``) and writes ``label
slot:1`` per row, 0-based slots. Here the same mapping runs
Spark-side: melt the row into (col_idx, value) pairs, broadcast-join
the featindex as a mapping table, build the one-hot vector, and export
with ``to_libsvm_lines`` — whose indices are 1-based (Spark's
format("libsvm") contract, documented in sources/writers.py), so the
comparison shifts by exactly one.
"""

import os

import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.sources.writers import to_libsvm_lines

REF_DIR = "/root/reference/LR/data"
CSV = os.path.join(REF_DIR, "churn_train_sample.csv")
SVM = os.path.join(REF_DIR, "churn_train_sample.svm")
FEATINDEX = os.path.join(REF_DIR, "churn_featindex.txt")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CSV) and os.path.exists(SVM)),
    reason="reference golden sample not available",
)


def _load_featindex() -> dict[str, int]:
    """FM/fm_libsvm/libsvm_transform.py:1-8 — whitespace-split pairs."""
    out: dict[str, int] = {}
    with open(FEATINDEX, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                out[parts[0]] = int(parts[1])
    return out


def _golden_lines() -> list[tuple[int, list[int]]]:
    """Golden svm parsed to (label, sorted 0-based slots)."""
    rows = []
    with open(SVM, encoding="utf8") as f:
        for line in f:
            toks = line.split()
            if toks:
                rows.append(
                    (int(toks[0]), sorted(int(t.split(":")[0]) for t in toks[1:]))
                )
    return rows


def test_codec_matches_reference_golden_sample(spark):
    featindex = _load_featindex()
    width = max(featindex.values()) + 1

    df = spark.read.csv(CSV, header=True).coalesce(1)
    feat_cols = df.columns[1:-1]  # drop USR_NUM_ID and label

    rid = F.monotonically_increasing_id()
    melted = (
        df.withColumn("rid", rid)
        .select(
            "rid",
            F.col("label").cast("int").alias("label"),
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            ":", F.lit(str(i)), F.col(c).cast("string")
                        ).alias("key")
                        for i, c in enumerate(feat_cols)
                    ]
                )
            ).alias("key"),
        )
    )
    # The featindex is a model artifact: loaded once driver-side and
    # broadcast as a mapping table — the reference's dict lookup, as a
    # Spark join.
    mapping = spark.createDataFrame(
        [(k, v) for k, v in featindex.items()], "key string, slot int"
    )
    joined = melted.join(F.broadcast(mapping), "key")
    assert joined.count() == melted.count(), "every cell must map to a slot"

    onehot = joined.groupBy("rid", "label").agg(
        F.sort_array(F.collect_list("slot")).alias("slots")
    )
    from pyspark.ml.functions import array_to_vector

    vectorized = onehot.select(
        "rid",
        "label",
        array_to_vector(
            F.expr(
                f"transform(sequence(0, {width - 1}), "
                f"j -> IF(array_contains(slots, j), 1D, 0D))"
            )
        ).alias("features"),
    ).orderBy("rid").coalesce(1)

    lines = [
        r.line for r in to_libsvm_lines(vectorized).collect()
    ]

    ours = []
    for line in lines:
        toks = line.split()
        # to_libsvm_lines is 1-based: shift back for the comparison.
        slots = sorted(int(t.split(":")[0]) - 1 for t in toks[1:])
        assert all(t.split(":")[1] == "1.0" for t in toks[1:])
        ours.append((int(toks[0]), slots))

    golden = _golden_lines()
    # The golden svm carries 20 lines while the sample csv holds 19
    # data rows; the first 19 align 1:1 (labels and slots), so the
    # assertion covers the rows both files share.
    assert len(ours) == 19
    assert ours == golden[: len(ours)]
