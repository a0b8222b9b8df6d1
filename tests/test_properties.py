"""Property-based tests (hypothesis): batched generated inputs, one
Spark job per example set.

* libsvm line codec: label + sparse slots survive the expression-built
  writer (sources/writers.py::to_libsvm_lines) for arbitrary sparse
  vectors — mirrors the reference's de-facto golden fixture pair
  (LR/data/churn_train_sample.csv ↔ .svm, SURVEY §5).
* round vs bround: Spark's HALF_UP/HALF_EVEN split (F5,
  RF/randomforest_churn.scala:67 vs :130) agrees with Python decimal
  on generated 3dp values, including the .5 ties that distinguish them.
"""

from __future__ import annotations

from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st

from pyspark.ml.linalg import Vectors
from pyspark.sql import functions as F

_slot = st.integers(min_value=0, max_value=19)
_val = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False,
    width=32,
)
_example = st.tuples(
    st.sampled_from([0.0, 1.0]),
    st.dictionaries(_slot, _val, min_size=0, max_size=6),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_example, min_size=1, max_size=8))
def test_libsvm_lines_roundtrip_property(spark, examples):
    from customer_churn_prediction_spark.sources import writers

    rows = [
        (label, Vectors.sparse(20, sorted(d.items())))
        for label, d in examples
    ]
    df = spark.createDataFrame(rows, ["label", "features"])
    lines = [r.line for r in writers.to_libsvm_lines(df).collect()]
    assert len(lines) == len(rows)
    for line, (label, d) in zip(lines, examples):
        parts = line.split(" ") if line else [""]
        assert float(parts[0]) == label
        got = {
            int(p.split(":")[0]) - 1: float(p.split(":")[1])
            for p in parts[1:]
            if p
        }
        want = {k: v for k, v in d.items() if v != 0}
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6 * max(1.0, abs(want[k]))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-99999, max_value=99999),
        min_size=1,
        max_size=50,
    )
)
def test_round_bround_match_decimal(spark, millis):
    # value = n/1000 exactly representable as Decimal; compare Spark's
    # 2dp round (HALF_UP) and bround (HALF_EVEN) against decimal.
    df = spark.createDataFrame(
        [(str(m),) for m in millis], ["m"]
    ).select(
        (F.col("m").cast("decimal(10,0)") / 1000)
        .cast("decimal(10,3)")
        .alias("x")
    )
    got = df.select(
        F.col("x"),
        F.round("x", 2).alias("r"),
        F.bround("x", 2).alias("b"),
    ).collect()
    for row in got:
        x = Decimal(row.x)
        assert Decimal(row.r) == x.quantize(Decimal("0.01"), ROUND_HALF_UP)
        assert Decimal(row.b) == x.quantize(Decimal("0.01"), ROUND_HALF_EVEN)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.5, allow_nan=False))
def test_hash_threshold_always_comparable(fraction):
    # ADVICE r3: fractions just below 1 used to round to the 5-char
    # '10000', which string-compares below almost every 4-char prefix
    # and silently turned a ~100% sample into ~6%.
    from customer_churn_prediction_spark.operators.relational import (
        hash_threshold,
    )

    thr = hash_threshold(fraction)
    assert thr == "g" or (
        len(thr) == 4 and all(c in "0123456789abcdef" for c in thr)
    )
    # 'g' sorts above every hex prefix; anything else must round-trip.
    if thr != "g":
        assert int(thr, 16) == round(fraction * 0x10000)
    else:
        assert round(fraction * 0x10000) >= 0x10000


def test_hash_threshold_monotone():
    from customer_churn_prediction_spark.operators.relational import (
        hash_threshold,
    )

    fracs = [0.0, 0.05, 0.2, 0.5, 0.9999, 0.9999925, 1.0]
    thrs = [hash_threshold(f) for f in fracs]
    assert thrs == sorted(thrs)  # 'g' > all hex strings byte-wise
    assert thrs[-1] == "g" and thrs[-2] == "g"
