"""Importance-resampling data selection (DSIR) — "give me more data
like THIS" at corpus scale.

The curation tier so far filters on intrinsic signals (quality score,
repetition, perplexity, dedup); DSIR (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling") adds the
DISTRIBUTIONAL one: score every raw document by how much more likely
its hashed n-gram bag is under a TARGET corpus' unigram bucket model
than under the raw corpus' own, then keep the top slice. It is the
standard cheap proxy for "select pretraining data that looks like
the high-quality domain" without training a classifier.

Spark shape (all linear, one corpus scan for the model and one for
the scoring — and the scoring join's build side is the B-row bucket
model, broadcastable at any corpus size):

  1. grams: whitespace unigrams + adjacent bigrams per doc (the
     published feature), hashed into ``DSIR_B`` buckets;
  2. ONE hash aggregate builds BOTH models — count(*) is the raw
     corpus count, sum(is_target) the target count (the target set
     rides a flag, so no second scan);
  3. per-bucket log-ratio delta_b = ln p_target(b) - ln p_raw(b),
     add-one smoothed, 6dp-rounded (the ``text_logprob`` float
     discipline: per-item rounding makes the per-doc fold
     order-stable across engines);
  4. per-doc importance logweight = sum of its grams' deltas; top
     ``DSIR_KEEP_FRAC`` of docs by (logweight, doc_id) are selected.

The selection tail (r11) is the scale form: an ``approx_percentile``
bracket on logweight plus exact counts proves where the top-quarter
boundary lies, docs strictly above/below the band are decided
map-side, and only the boundary band pays the exact
(logweight, doc_id) rank — the corpus-count global window lives on
solely in ``dsir_report_exact``, the verified-equal twin that pins
the semantics. Hashes are md5-derived, so the DuckDB oracle rebuilds
the identical buckets and the whole report hash-compares
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

DSIR_B = 2048          # hashed feature buckets (power of two, tiny)
DSIR_SEED = "dsir|"
DSIR_KEEP_FRAC = 0.25  # keep the top quarter by importance weight
_TARGET_LANG = "en"    # the target distribution: English docs


def _bucket(gram_col):
    """60-bit md5-derived hash % B — portable (the DuckDB oracle
    computes the same bucket), same trick as the Bloom/KMV sketches."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(DSIR_SEED), gram_col)), 1, 15
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(DSIR_B),
    )


def _grams(docs: DataFrame) -> DataFrame:
    """(doc_id, is_target, b): one row per unigram/bigram occurrence,
    already bucketed. The whitespace split is the catalog-wide
    convention (``text/analysis._tokens``) so every text op and its
    oracle agree on tokenization."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = docs.select(
        "doc_id",
        (F.col("lang") == _TARGET_LANG).cast("int").alias("is_target"),
        toks.alias("t"),
    )
    # ONE explode for unigrams + bigrams (r14 optimization): the old
    # union of two exploded branches tokenized and scanned the corpus
    # twice; concat()ing the two gram arrays inside a single Generate
    # emits the identical multiset of (doc_id, is_target, gram) rows
    # off one pass.
    return d.select(
        "doc_id",
        "is_target",
        F.explode(
            F.concat(
                F.col("t"),
                F.expr(
                    "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', element_at(t, i + 2)))"
                ),
            )
        ).alias("gram"),
    ).select(
        "doc_id", "is_target", _bucket(F.col("gram")).alias("b")
    )


def bucket_model(grams: DataFrame) -> DataFrame:
    """(b, delta): the per-bucket target-vs-raw log-ratio — ONE hash
    aggregate builds both models (the target rides the is_target
    flag). The single source of truth for the model projection: the
    batch report and the frozen on-ingest model
    (``streaming/selection.freeze_model``) both call this, so the two
    paths cannot drift. Deltas are 6dp-rounded BEFORE any per-doc
    fold (the ``text_logprob`` float discipline — order-stable sums
    across engines)."""
    from pyspark.sql import Window

    buckets = grams.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("q_cnt"),
        F.sum("is_target").cast("long").alias("t_cnt"),
    )
    wall = Window.partitionBy()
    return (
        buckets.withColumn("n_q", F.sum("q_cnt").over(wall))
        .withColumn("n_t", F.sum("t_cnt").over(wall))
        .select(
            "b",
            F.round(
                F.log(
                    (F.col("t_cnt") + 1)
                    / (F.col("n_t") + F.lit(DSIR_B))
                )
                - F.log(
                    (F.col("q_cnt") + 1)
                    / (F.col("n_q") + F.lit(DSIR_B))
                ),
                6,
            ).alias("delta"),
        )
    )


# Band-stats fit memo, keyed by sf_dir (the ``similarity/ann.py``
# ``_CENT_CACHE`` fit-once precedent), guarded by a corpus
# fingerprint: unlike stale centroids (still self-consistent
# approximate answers), stale band stats would make an EXACT-
# semantics output wrong. r12 (ADVICE r11): the fingerprint is a
# CONTENT hash — (count, bit_xor of per-row xxhash64) over the frame
# the fit reads — not the doc count alone, so a corpus re-ingested at
# the same path with an equal row count but different content misses
# the memo and refits. One linear scan, order-independent (bit_xor
# commutes), no overflow (XOR, not SUM), never compared against the
# oracle (driver-side refit decision only). The cached value is
# (fingerprint, stats).
_BAND_CACHE: dict[
    str, tuple[tuple[int, int], tuple[int, int, float, float]]
] = {}


def _fingerprint(df: DataFrame, *cols: str) -> tuple[int, int]:
    """(row count, bit_xor of xxhash64(cols)) — the cheap content
    identity used to validate fit-once memos. XOR-fold of per-row
    hashes: one scan + partial aggregation, stable under row order
    and partitioning."""
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(cols) + "))"
            ),
            F.lit(0),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _band_stats_for(
    key: str, scored_src: DataFrame, fingerprint: tuple[int, int]
) -> tuple[int, int, float, float]:
    """Fingerprinted memo fetch: refit when the corpus CONTENT at
    ``key`` changed since the cached fit (re-ingested corpus at the
    same path — equal count no longer enough to hit the memo)."""
    hit = _BAND_CACHE.get(key)
    if hit is None or hit[0] != fingerprint:
        _BAND_CACHE[key] = (fingerprint, _band_stats(scored_src))
    return _BAND_CACHE[key][1]


def corpus_select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: importance-weight every doc against the target distribution, keep the top slice.

    Columns: doc_id, n_grams, logweight, selected."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    fp = _fingerprint(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        "text",
    )
    stats = _band_stats_for(sf_dir, _dsir_scored(docs), fp)
    return dsir_report(docs, _stats=stats)


# Percentile offset around (1 - KEEP_FRAC) that brackets the selection
# boundary. Spark's approx_percentile at ACCURACY a guarantees rank
# error <= n/a = 1e-4·n; the ±2e-3 offset is 20x that bound, so the
# true k-th boundary falls inside [lo, hi] unless a single logweight
# value carries >~0.4% of the corpus (the declarative band_ok guard
# falls back to the exact global rank in that case — output is
# IDENTICAL either way, the band only changes which rows the rank
# window has to touch).
_DSIR_BAND_EPS = 2e-3
_DSIR_PCT_ACCURACY = 10_000


def _dsir_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, logweight): the per-doc importance fold —
    shared by the threshold (registered) and exact-rank (twin)
    selection tails, so the two forms cannot drift upstream of the
    top-k step."""
    grams = _grams(docs)
    model = bucket_model(grams)

    # every doc has >= 1 unigram (the split of an empty string is
    # ['']), so the inner join keeps the whole corpus.
    # The model is DSIR_B rows BY CONSTRUCTION (2048 buckets at any
    # corpus size) — broadcast it explicitly (r14) so the gram stream
    # never shuffles on the bucket key; the planner's estimate for an
    # aggregate-over-window subtree is unreliable and a silent SMJ
    # here would shuffle O(tokens) rows at 100 TB.
    return (
        grams.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.round(F.sum("delta"), 6).alias("logweight"),
        )
    )


def _band_stats(scored: DataFrame) -> tuple[int, int, float, float]:
    """Fit the selection band: (k, c_above, lo, hi).

    Two bounded scalar aggregates (the ``_centroids`` fit-once
    pattern — a 1-row ``first()``, never an unbounded collect):

      1. n_docs + ``approx_percentile`` brackets [lo, hi] around the
         (1 - KEEP_FRAC) boundary;
      2. exact counts c_hi = |logweight > hi|, c_lo = |logweight >=
         lo| — band_ok = (c_hi <= k <= c_lo) PROVES the true k-th
         boundary lies inside the band.

    If band_ok fails (pathological tie mass at the boundary — e.g.
    the constructed tie-heavy test corpus) the band widens to
    (-inf, +inf): the serving plan degrades to the exact global rank,
    so the OUTPUT is identical in every case; the band only changes
    how many rows the rank window touches."""
    import math

    row = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            f"approx_percentile(logweight, "
            f"{1.0 - DSIR_KEEP_FRAC - _DSIR_BAND_EPS!r}, "
            f"{_DSIR_PCT_ACCURACY})"
        ).alias("lo"),
        F.expr(
            f"approx_percentile(logweight, "
            f"{min(1.0, 1.0 - DSIR_KEEP_FRAC + _DSIR_BAND_EPS)!r}, "
            f"{_DSIR_PCT_ACCURACY})"
        ).alias("hi"),
    ).first()
    k = math.ceil(DSIR_KEEP_FRAC * row["n"])
    if row["n"] == 0:
        return 0, 0, float("-inf"), float("inf")
    lo, hi = float(row["lo"]), float(row["hi"])
    c = scored.agg(
        F.sum((F.col("logweight") > hi).cast("long")).alias("c_hi"),
        F.sum((F.col("logweight") >= lo).cast("long")).alias("c_lo"),
    ).first()
    if not (c["c_hi"] <= k <= c["c_lo"]):
        return k, 0, float("-inf"), float("inf")
    return k, int(c["c_hi"]), lo, hi


def dsir_report(
    docs: DataFrame,
    _stats: tuple[int, int, float, float] | None = None,
) -> DataFrame:
    """The DSIR computation over any (doc_id, lang, text) frame —
    split out so constructed-corpus tests can drive the selection
    property directly.

    Selection tail (r11, VERDICT r10 item 3 — the scale form): the
    r10 registered plan ranked ALL corpus-count doc rows through one
    ``Window.orderBy`` task — the named scale-killer. Now the fitted
    band literals from ``_band_stats`` decide almost every row
    map-side (above hi → selected, below lo → rejected) and ONLY the
    band rows (expected ~2·eps·n ± sketch error) pay the exact
    (logweight desc, doc_id) rank, offset by the exact above-band
    count. The rank rides ONE window partitioned by
    (in_band, in_band ? 0 : doc_id): band rows share one partition
    (the single small rank task), every other row is its own
    partition — so the plan evaluates the scored subtree ONCE with
    one extra hash shuffle, no union fan-out, no corpus-wide single
    task. The r10 oracle SQL (exact top-k) still hash-compares
    bit-for-bit, and tests/test_selection.py pins
    ``dsir_report ≡ dsir_report_exact`` on both the band path and the
    tie-heavy fallback path."""
    scored = _dsir_scored(docs)
    if _stats is None:
        _stats = _band_stats(scored)
    return _select_tail(scored, _stats)


def _select_tail(
    scored: DataFrame, stats: tuple[int, int, float, float]
) -> DataFrame:
    """The band-rank selection tail over any (doc_id, n_grams,
    logweight) frame + fitted band stats — shared by the inline form
    (``dsir_report``) and the at-rest form
    (``corpus_select_dsir_stored``), so the two serve the identical
    plan over different scored sources."""
    k, c_above, lo, hi = stats
    in_band = (F.col("logweight") >= F.lit(lo)) & (
        F.col("logweight") <= F.lit(hi)
    )
    w_band = Window.partitionBy("in_band", "pk").orderBy(
        F.desc("logweight"), F.asc("doc_id")
    )
    return (
        scored.withColumn("in_band", in_band)
        .withColumn(
            "pk",
            F.when(F.col("in_band"), F.lit(0)).otherwise(
                F.col("doc_id")
            ),
        )
        .withColumn("rn", F.row_number().over(w_band))
        .select(
            "doc_id",
            "n_grams",
            "logweight",
            F.when(F.col("logweight") > F.lit(hi), F.lit(True))
            .when(F.col("logweight") < F.lit(lo), F.lit(False))
            .otherwise(F.lit(c_above) + F.col("rn") <= F.lit(k))
            .alias("selected"),
        )
    )


def dsir_scores_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The doc-level DSIR score table as an at-rest managed table —
    the production fit path the band-fit docstring promises: the gram
    pipeline (explode + model join + per-doc fold, the expensive
    part) runs ONCE at ingest; the band fit and every subsequent
    selection serve from the stored (doc_id, n_grams, logweight)
    table. Same fit-once discipline as the corpus LSH bands / IVF
    lists / PQ codes (``managed_ingest`` idempotency + erasure-ledger
    re-scrub on rebuild)."""
    from ..sources.writers import managed_ingest, sf_tag

    table = f"dsir_scores_{sf_tag(sf_dir)}"

    def _write(path: str) -> None:
        (
            _dsir_scored(
                load_table(spark, sf_dir, "documents", spread=True)
            )
            .write.mode("overwrite")
            .option("path", path)
            .format("parquet")
            .saveAsTable(table)
        )

    return managed_ingest(spark, table, _write)


def corpus_select_dsir_stored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``corpus_select_dsir`` in its production shape: scores come
    from the at-rest table (``dsir_scores_ingest``) — same output
    rows, same oracle; the gram pipeline drops out of both the band
    fit and the serve (the ``brand_recommendations_stored`` /
    ``ann_bruteforce_int8_stored`` at-rest-twin discipline). The fit
    here is two aggregates over a 3-column doc-level scan.

    Fingerprint (r12, ADVICE r11): the memo keys on the CONTENT of
    the stored score table (count + bit_xor row hash), so the band
    fit can never be inconsistent with the scores it serves — even
    when the managed table is rebuilt to an equal row count. Score
    freshness vs the SOURCE lake is ``managed_ingest``'s contract
    (explicit rebuild + erasure re-scrub), not this memo's: the memo
    guarantees fit ≡ stored scores, whichever ingest generation is
    at rest."""
    scored = dsir_scores_ingest(spark, sf_dir)
    fp = _fingerprint(scored, "doc_id", "n_grams", "logweight")
    stats = _band_stats_for(f"stored:{sf_dir}", scored, fp)
    return _select_tail(scored, stats)


def dsir_report_exact(docs: DataFrame) -> DataFrame:
    """The r10 exact-rank form — every doc row through one global
    (logweight desc, doc_id) window. Kept as the verified-equal twin
    of the registered threshold plan (tests/test_selection.py pins
    ``dsir_report ≡ dsir_report_exact``, the rfm_window precedent):
    this is the form whose single rank task dies at 100-TB doc
    counts, so it holds no registry slot."""
    scored = _dsir_scored(docs)
    n = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w_rank = Window.orderBy(F.desc("logweight"), F.asc("doc_id"))
    return (
        scored.crossJoin(F.broadcast(n))
        .withColumn("rn", F.row_number().over(w_rank))
        .select(
            "doc_id",
            "n_grams",
            "logweight",
            (
                F.col("rn")
                <= F.ceil(F.lit(DSIR_KEEP_FRAC) * F.col("n_docs"))
            ).alias("selected"),
        )
    )


_BUCKET_SQL = (
    f"CAST(('0x' || substring(md5('{DSIR_SEED}' || gram), 1, 15)) "
    f"AS BIGINT) % {DSIR_B}"
)

DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN lang = '{_TARGET_LANG}' THEN 1 ELSE 0 END
           AS is_target,
         string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, is_target, unnest(t) AS gram FROM toks
  UNION ALL
  SELECT doc_id, is_target,
         unnest(list_transform(t[1:len(t) - 1],
                               (x, i) -> x || ' ' || t[i + 1]))
  FROM toks
),
bucketed AS (
  SELECT doc_id, is_target, {_BUCKET_SQL} AS b FROM grams
),
buckets AS (
  SELECT b, CAST(count(*) AS BIGINT) AS q_cnt,
         CAST(sum(is_target) AS BIGINT) AS t_cnt
  FROM bucketed GROUP BY 1
),
model AS (
  SELECT b,
         round(ln((t_cnt + 1)
                  / (CAST(sum(t_cnt) OVER () AS DOUBLE) + {DSIR_B}))
               - ln((q_cnt + 1)
                  / (CAST(sum(q_cnt) OVER () AS DOUBLE) + {DSIR_B})),
               6) AS delta
  FROM buckets
),
scored AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         round(sum(m.delta), 6) AS logweight
  FROM bucketed g JOIN model m USING (b)
  GROUP BY 1
)
SELECT doc_id, n_grams, logweight,
       row_number() OVER (ORDER BY logweight DESC, doc_id)
         <= ceil({DSIR_KEEP_FRAC} * (SELECT count(*) FROM scored))
         AS selected
FROM scored
"""

# r10 graduation: the module's only query moved from the staged tier
# into the registry wholesale (the similarity.recall precedent) — the
# slot was freed by retiring the ann_ivf inline baseline
# (registry.RETIRED). The streaming twin stays in
# streaming/selection.py, pytest-covered.
QUERIES = {
    "corpus_select_dsir": corpus_select_dsir,
}
ORACLES = {
    "corpus_select_dsir": DSIR_ORACLE,
}

# r11: the at-rest production twin stays staged (registry ceiling);
# identical output, same committed oracle.
STAGED_QUERIES = {
    "corpus_select_dsir_stored": corpus_select_dsir_stored,
}
STAGED_ORACLES = {
    "corpus_select_dsir_stored": DSIR_ORACLE,
}
