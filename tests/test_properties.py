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


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=0, max_size=40,
        ),
        min_size=1, max_size=30, unique=True,
    )
)
def test_sketch_hash_domains_property(spark, keys):
    """Bloom positions land in [0, M) with exactly k per key; HLL
    buckets land in [0, m) with rho in [1, 57] — for arbitrary key
    strings, including empty and metacharacter-heavy ones (the hash
    layer must never leak a malformed slot into a sketch store)."""
    from customer_churn_prediction_spark.operators import sketches as sk

    df = spark.createDataFrame([(k,) for k in keys], "key string")
    pos = df.select(
        "key", F.explode(sk._bloom_positions(F.col("key"))).alias("bit")
    ).collect()
    assert len(pos) == sk.BLOOM_K * len(keys)
    assert all(0 <= r.bit < sk.BLOOM_M for r in pos)
    # deterministic: same key -> same positions on a re-run
    pos2 = df.select(
        "key", F.explode(sk._bloom_positions(F.col("key"))).alias("bit")
    ).collect()
    assert sorted(map(tuple, pos)) == sorted(map(tuple, pos2))

    regs = sk.hll_registers(df).collect()
    assert all(0 <= r.bucket < sk.HLL_M for r in regs)
    assert all(1 <= r.max_rho <= 57 for r in regs)
    # registers are a function of the key SET: shuffled input agrees
    regs2 = sk.hll_registers(
        spark.createDataFrame([(k,) for k in reversed(keys)], "key string")
    ).collect()
    assert sorted(map(tuple, regs)) == sorted(map(tuple, regs2))
