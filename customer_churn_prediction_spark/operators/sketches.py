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


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_SEEDS = (101, 103, 107, 109)
CMS_TOPK = 20
_E = 2.718281828459045


def _cms_cells(key_col):
    """The d (row, bucket) cells a key hashes to — one array literal,
    exploded, so the sketch build stays a single scan."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("h"),
                    F.pmod(
                        F.xxhash64(key_col, F.lit(CMS_SEEDS[i])),
                        F.lit(CMS_WIDTH),
                    ).alias("b"),
                )
                for i in range(CMS_DEPTH)
            ]
        )
    )


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K hot keys with a count-min-sketch error contract.

    The 100-TB problem this solves is SKEW DETECTION: before a big
    keyed join/agg you want the hot keys (to salt or isolate them —
    `salted_join_revenue` is the actuation) without paying a full
    exact per-key count. The CMS is the standard answer: a d x w grid
    of counters (here 4 x 1024 = 4096 cells TOTAL, independent of key
    cardinality), built map-side-mergeable in one scan — partial
    aggregation caps every task's shuffle contribution at d*w rows, so
    the sketch costs the same shuffle whether the table has 1e4 or
    1e12 rows. Estimates never undercount (min over d counters), and
    overcount is bounded by (e/w)*N with probability 1 - e^-d per
    lookup (Cormode & Muthukrishnan 2005).

    Following the ``approx_distinct_users`` graduation pattern, the
    query emits the EXACT top-K (count desc, key asc — deterministic
    at tie boundaries) plus two in-query verdict booleans per key —
    ``no_undercount`` (est >= exact, a hard CMS guarantee) and
    ``within_band`` (est <= exact + (e/w)*N) — and the DuckDB oracle
    recomputes the exact side with TRUE literals, so a hash match
    verifies the sketch honored its advertised bounds without
    comparing sketch internals across engines."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    key = F.col("user_id")

    sketch = (
        ev.select(_cms_cells(key).alias("cell"))
        .select("cell.h", "cell.b")
        .groupBy("h", "b")
        .agg(F.count("*").alias("cell_cnt"))
    )
    exact = ev.groupBy(key.alias("key")).agg(
        F.count("*").alias("exact_cnt")
    )
    topk = exact.orderBy(F.desc("exact_cnt"), F.asc("key")).limit(
        CMS_TOPK
    )
    # N from the exact aggregate, not a third scan: AQE reuses the
    # per-key aggregate's exchange for this branch (pinned in the
    # executed plan by tests/test_sketches.py). The exact side is the
    # verification harness anyway; a production skew probe would ship
    # ONLY the sketch scan.
    total = exact.agg(F.sum("exact_cnt").alias("n_total"))

    est = (
        topk.select(
            "key", "exact_cnt", _cms_cells(F.col("key")).alias("cell")
        )
        .select("key", "exact_cnt", "cell.h", "cell.b")
        .join(F.broadcast(sketch), ["h", "b"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cell_cnt").alias("est"))
    )
    return est.crossJoin(F.broadcast(total)).select(
        "key",
        "exact_cnt",
        (F.col("est") >= F.col("exact_cnt")).alias("no_undercount"),
        (
            F.col("est")
            <= F.col("exact_cnt")
            + F.lit(_E / CMS_WIDTH) * F.col("n_total")
        ).alias("within_band"),
    )


HEAVY_HITTERS_ORACLE = f"""
WITH c AS (
  SELECT user_id AS key, count(*) AS exact_cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT key, exact_cnt,
       TRUE AS no_undercount,
       TRUE AS within_band
FROM c ORDER BY exact_cnt DESC, key ASC LIMIT {CMS_TOPK}
"""


APPROX_PERCENTILE_ORACLE = f"""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS exact_p50,
       TRUE AS in_band_p50,
       round(quantile_cont(l_quantity, 0.95), 6) AS exact_p95,
       TRUE AS in_band_p95
FROM lineitem GROUP BY l_returnflag
"""

HLL_M = 256  # registers; standard error 1.04/sqrt(m) ~ 6.5%
HLL_SEED = 127
# alpha_m for m >= 128 (Flajolet et al. 2007, HyperLogLog)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# verdict band: 3 standard errors of the raw estimator
HLL_BAND = 3 * 1.04 / (HLL_M ** 0.5)


def hll_registers(keys: DataFrame, key: str = "key") -> DataFrame:
    """The m max-rho registers of a key column — THE mergeable
    cardinality state (register-wise max is the merge, which is what
    lets a stream maintain it; ``streaming/hll.py``).

    Bucket = low 8 hash bits; rho = leading-zero rank of the remaining
    56 bits, computed with INTEGER arithmetic (57 - bit_length) — no
    log2 float whose last ulp could flip a register."""
    h = F.xxhash64(F.col(key), F.lit(HLL_SEED))
    w = F.shiftrightunsigned(h, 8)
    df = keys.select(
        F.pmod(h, F.lit(HLL_M)).cast("int").alias("bucket"),
        w.alias("w"),
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(57))
        .otherwise(F.lit(57) - F.length(F.bin("w")))
        .cast("int")
    )
    return (
        df.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_expr(regs: DataFrame):
    """1-row (est double) from a registers frame: harmonic-mean raw
    estimate with the small-range linear-counting correction — the
    published HyperLogLog estimator, all in one tiny aggregate (the
    registers frame is <= m rows; absent buckets contribute 2^0)."""
    # coalesce: an EMPTY registers frame (no keys yet — empty table,
    # all-NULL keys, a store before its first non-empty epoch) sums to
    # NULL; 0.0 makes z = m, routes into linear counting with
    # v_zero = m, and yields est 0 — the correct empty-set answer
    # (review r8: NULL here diverged from the oracle's TRUE verdict).
    agg = regs.agg(
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)
        ).alias("z_present"),
        F.count(F.lit(1)).alias("v_present"),
    )
    z = F.col("z_present") + (F.lit(HLL_M) - F.col("v_present"))
    v_zero = F.lit(HLL_M) - F.col("v_present")
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / z
    e = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero),
    ).otherwise(e_raw)
    return agg.select(e.alias("est"))


def distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user count with a HyperLogLog error-contract
    verdict — the cardinality sibling of ``heavy_hitters_cms``, same
    graduation pattern: the query emits the EXACT count plus an
    in-query boolean asserting our own mergeable-register HLL
    (``hll_registers`` — the state ``streaming/hll.py`` maintains on
    ingest) landed within 3 standard errors, and the DuckDB oracle
    recomputes the exact side with a TRUE literal. Spark's built-in
    ``approx_count_distinct`` is already registry-verified the same
    way (``approx_distinct_users``); this one exists because ITS
    registers are ours to maintain incrementally — a sketch you can't
    merge across epochs can't be a streaming monitor."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    regs = hll_registers(ev.select(F.col("user_id").alias("key")))
    est = hll_estimate_expr(regs)
    exact = ev.agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(HLL_BAND) * F.col("n_exact")
        ).alias("within_band"),
    )


HLL_ORACLE = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_band
FROM events WHERE user_id IS NOT NULL
"""

# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_sketches.py holds
# them to driver rigor regardless.
QUERIES = {
    "approx_percentile_bands": approx_percentile_bands,
    "heavy_hitters_cms": heavy_hitters_cms,
    "distinct_users_hll": distinct_users_hll,
}
ORACLES = {
    "approx_percentile_bands": APPROX_PERCENTILE_ORACLE,
    "heavy_hitters_cms": HEAVY_HITTERS_ORACLE,
    "distinct_users_hll": HLL_ORACLE,
}
