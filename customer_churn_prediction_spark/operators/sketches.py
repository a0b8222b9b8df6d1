"""Quantile-sketch operator with an oracle-checkable error contract.

``percentile_quantity`` ships the exact percentiles (an all-values
shuffle — fine when the group fits an executor); at 100 TB the
standard replacement is ``approx_percentile`` (Greenwald–Khanna
sketch: fixed memory per group, mergeable map-side, rank error
bounded by 1/accuracy). Like every sketch, its output is
engine-specific — so, following the ``approx_distinct_users``
graduation pattern, the QUERY emits the exact values plus in-query
booleans asserting the sketch honored its advertised bound, and the
DuckDB oracle recomputes the exact side with ``TRUE`` literals: a
hash match verifies both the exact path and the error contract,
without ever comparing two sketch implementations bit-for-bit.

Band: GK guarantees the returned element's RANK is within
``eps = 1/accuracy`` of the target, so its VALUE must lie between the
exact percentiles at ``p ± 2·eps`` (the extra eps absorbs
interpolation-vs-element discreteness at tied ranks; percentile() is
monotone in p, so the bracket is well-ordered)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

ACCURACY = 1000
_EPS = 1.0 / ACCURACY
_PS = (0.5, 0.95)


def approx_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: exact p50/p95 of l_quantity plus the sketch's
    error-contract verdicts. One hash aggregate; the sketch and the
    exact percentiles ride the same pass."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for p in _PS:
        tag = f"p{int(p * 100)}"
        lo, hi = max(0.0, p - 2 * _EPS), min(1.0, p + 2 * _EPS)
        aggs += [
            F.percentile("l_quantity", p).alias(f"exact_{tag}"),
            F.percentile("l_quantity", lo).alias(f"_lo_{tag}"),
            F.percentile("l_quantity", hi).alias(f"_hi_{tag}"),
            F.expr(
                f"approx_percentile(l_quantity, {p}, {ACCURACY})"
            ).alias(f"_approx_{tag}"),
        ]
    agg = li.groupBy("l_returnflag").agg(*aggs)
    out_cols = [F.col("l_returnflag")]
    for p in _PS:
        tag = f"p{int(p * 100)}"
        out_cols += [
            F.round(F.col(f"exact_{tag}"), 6).alias(f"exact_{tag}"),
            (
                (F.col(f"_approx_{tag}") >= F.col(f"_lo_{tag}"))
                & (F.col(f"_approx_{tag}") <= F.col(f"_hi_{tag}"))
            ).alias(f"in_band_{tag}"),
        ]
    return agg.select(*out_cols)


APPROX_PERCENTILE_ORACLE = f"""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
       TRUE AS in_band_p50,
       round(quantile_cont(l_quantity, 0.95), 6) AS exact_p95,
       TRUE AS in_band_p95
FROM lineitem GROUP BY l_returnflag
"""

# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_sketches.py holds
# them to driver rigor regardless.
QUERIES = {"approx_percentile_bands": approx_percentile_bands}
ORACLES = {"approx_percentile_bands": APPROX_PERCENTILE_ORACLE}
