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

The final rank is a window over DOC-level rows (corpus-count rows,
not gram rows). At 100 TB-corpus doc counts, replace the exact global
rank with an ``approx_percentile`` threshold on logweight and resolve
only the boundary band exactly — same swap the topk/quantile ops
document. Hashes are md5-derived, so the DuckDB oracle rebuilds the
identical buckets and the whole report hash-compares bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    uni = d.select(
        "doc_id", "is_target", F.explode("t").alias("gram")
    )
    bi = d.select(
        "doc_id",
        "is_target",
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (x, i) -> concat(x, ' ', element_at(t, i + 2)))"
            )
        ).alias("gram"),
    )
    return uni.unionByName(bi).select(
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


def corpus_select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: importance-weight every doc against the target distribution, keep the top slice.

    Columns: doc_id, n_grams, logweight, selected."""
    return dsir_report(
        load_table(spark, sf_dir, "documents", spread=True)
    )


def dsir_report(docs: DataFrame) -> DataFrame:
    """The DSIR computation over any (doc_id, lang, text) frame —
    split out so constructed-corpus tests can drive the selection
    property directly."""
    from pyspark.sql import Window

    wall = Window.partitionBy()
    grams = _grams(docs)
    model = bucket_model(grams)

    # every doc has >= 1 unigram (the split of an empty string is
    # ['']), so the inner join keeps the whole corpus
    scored = (
        grams.join(model, "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.round(F.sum("delta"), 6).alias("logweight"),
        )
    )
    w_rank = Window.orderBy(F.desc("logweight"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n_docs", F.count(F.lit(1)).over(wall))
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
