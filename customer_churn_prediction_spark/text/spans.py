"""Exact duplicate-span detection (Lee et al. 2022's ExactSubstr,
word-gram form): per document, how much of it is covered by word
k-grams that occur more than once in the corpus.

Where the MinHash/SimHash tier asks "which documents are near-dups of
each other", this asks the finer question "which PARTS of every
document are copied from anywhere" — boilerplate headers, license
blocks, templated sentences — the signal used to cut repeated
substrings out of LLM training data. The suffix-array construction of
the paper is replaced by the Spark-native equivalent: positional
k-gram hashing + a corpus-frequency window + per-document interval
union, all linear shuffles.

Plan shape (scales to 100 TB):
  1. one scan; per doc ONE split/md5 expression emits
     (n_tokens, [(pos, gram_hash)…]) — the struct ride-along keeps the
     tokenizer from being re-inlined per use (§4.1 hygiene);
     ``explode_outer`` keeps sub-k docs with a NULL occurrence so the
     output covers every document without a second documents scan.
  2. corpus frequency via a count window keyed by gram (one shuffle) —
     a gram is duplicated if it occurs ≥2 times anywhere (across OR
     within documents).
  3. per-doc interval union of the fixed-length spans: sorted by
     position, each dup start covers ``min(K, next_start - start)``
     tokens — a lead() window keyed by (doc, is_dup), then one
     per-doc aggregate.
No pairwise expansion anywhere: cost is O(total tokens) rows through
3 linear shuffles, vs the suffix array's O(corpus log corpus) single
machine sort. Staged for registry round 6 (driver budget full in r5);
oracle parity is enforced by tests/test_spans.py in the meantime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

# Word-gram width. The paper uses 50 BPE tokens; 5 words keeps the
# fixture corpus (short synthetic docs) meaningfully covered while the
# plan is width-independent.
DUP_SPAN_K = 5


def _pos_grams_spark() -> str:
    """One expression -> struct(n_tokens, occ: array<struct<pos,gram>>).

    gram = 60-bit md5-derived BIGINT of the space-joined k words
    (same hash family as the shingle tier, dedup.py:419) so the
    frequency-window shuffle key is 8 bytes.
    """
    toks = "split(trim(lower(text)), '\\\\s+')"
    words = ", ".join(
        f"element_at({toks}, i + {j})" for j in range(DUP_SPAN_K)
    )
    return (
        f"named_struct("
        f"'n_tokens', size({toks}), "
        f"'occ', if(size({toks}) >= {DUP_SPAN_K}, "
        f"transform(sequence(1, size({toks}) - {DUP_SPAN_K - 1}), "
        f"i -> named_struct('pos', i, "
        f"'gram', cast(conv(substring(md5(concat_ws(' ', {words})), 1, 15), "
        f"16, 10) as bigint))), "
        f"cast(array() as array<struct<pos:int,gram:bigint>>)))"
    )


def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: duplicated k-gram starts, covered tokens, and the
    covered fraction (0 for clean or sub-k docs)."""
    return dup_span_frame(load_table(spark, sf_dir, "documents", spread=True))


def _marked_occurrences(d: DataFrame) -> DataFrame:
    """Shared detection core: one row per k-gram occurrence —
    (doc_id, n_tokens, pos, gram, is_dup) — with one NULL-occurrence
    row per sub-K document (explode_outer keeps them visible without a
    second documents scan).

    NULL-gram rows never count as duplicated, but a plain
    partitionBy("gram") would funnel ALL of them into one task — at
    web scale that single NULL partition is a straggler. Salting the
    window key by doc_id for NULL grams spreads them; the (wrong)
    per-salt count is never read because is_dup requires a non-null
    gram."""
    occ = (
        d.select("doc_id", F.expr(_pos_grams_spark()).alias("s"))
        .select(
            "doc_id",
            F.col("s.n_tokens").alias("n_tokens"),
            F.explode_outer("s.occ").alias("g"),
        )
        .select("doc_id", "n_tokens", F.col("g.pos").alias("pos"),
                F.col("g.gram").alias("gram"))
    )
    w_gram = Window.partitionBy(
        "gram",
        F.when(F.col("gram").isNull(), F.col("doc_id")).otherwise(F.lit(0)),
    )
    return occ.withColumn(
        "is_dup",
        F.col("gram").isNotNull() & (F.count(F.lit(1)).over(w_gram) > 1),
    )


def dup_span_frame(d: DataFrame) -> DataFrame:
    """Core plan over any (doc_id, text) frame.

    The lead window partitions by doc_id ALONE and orders by
    (is_dup, pos) (r14 optimization): within a doc the dup rows sort
    contiguously after the non-dup rows, so lead(pos) still reads the
    NEXT DUP START for every is_dup row (the only rows covered_term
    evaluates) — and the final per-doc aggregate is satisfied by the
    window's hash(doc_id) clustering, removing the extra
    (doc_id, is_dup)-keyed Exchange of the whole occurrence stream
    (3 shuffles → 2; guide §2.4's share-one-exchange rule)."""
    marked = _marked_occurrences(d)
    w_doc = Window.partitionBy("doc_id").orderBy("is_dup", "pos")
    covered_term = F.when(
        F.col("is_dup"),
        F.least(
            F.lit(DUP_SPAN_K),
            F.coalesce(
                F.lead("pos").over(w_doc) - F.col("pos"),
                F.lit(DUP_SPAN_K),
            ),
        ),
    )
    return (
        marked.withColumn("covered_term", covered_term)
        .groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.sum(F.col("is_dup").cast("long")).alias("dup_starts"),
            F.coalesce(F.sum("covered_term"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.round(
                F.coalesce(
                    F.try_divide(
                        F.sum("covered_term"),
                        F.max("n_tokens"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"
_GRAM_WORDS = " || ' ' || ".join(
    f"t[pos + {j}]" for j in range(DUP_SPAN_K)
)

DUP_SPAN_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
pos_rows AS (
  SELECT doc_id, len(t) AS n_tokens, t,
         unnest(range(1, len(t) - {DUP_SPAN_K - 2})) AS pos
  FROM base WHERE len(t) >= {DUP_SPAN_K}
),
occ AS (
  SELECT doc_id, n_tokens, pos,
         CAST(('0x' || substring(md5({_GRAM_WORDS}), 1, 15)) AS BIGINT)
           AS gram
  FROM pos_rows
),
marked AS (
  SELECT *, count(*) OVER (PARTITION BY gram) > 1 AS is_dup FROM occ
),
spans AS (
  SELECT doc_id, pos,
         least({DUP_SPAN_K},
               coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          - pos, {DUP_SPAN_K})) AS covered
  FROM marked WHERE is_dup
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_starts,
         CAST(sum(covered) AS BIGINT) AS covered_tokens
  FROM spans GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.t) AS BIGINT) AS n_tokens,
       coalesce(a.dup_starts, 0) AS dup_starts,
       coalesce(a.covered_tokens, 0) AS covered_tokens,
       round(coalesce(a.covered_tokens / nullif(CAST(len(b.t) AS DOUBLE), 0),
                      0.0), 6) AS dup_fraction
FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
"""

def clean_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actuation of :func:`dup_span_stats`: rewrite every document
    with its duplicated spans REMOVED (what the ExactSubstr paper
    actually does to the training corpus).

    Linear composition on top of the detection plan:
      1. token-level rows (doc_id, pos, token) from one posexplode;
      2. left join the duplicated gram STARTS on (doc_id, pos) — a
         co-keyed equi-join, no expansion;
      3. a position is covered iff some dup start lies in
         (pos−K, pos] — a rolling ``max`` window over K−1 preceding
         rows per doc (never an O(n·starts) per-token membership
         scan, which would go quadratic on heavily-duplicated docs);
      4. rebuild the text from uncovered tokens in position order.
    """
    return clean_spans_frame(
        load_table(spark, sf_dir, "documents", spread=True)
    )


def clean_spans_frame(d: DataFrame) -> DataFrame:
    starts = (
        _marked_occurrences(d)
        .where(F.col("is_dup"))
        .select("doc_id", "pos", F.lit(1).alias("start_flag"))
    )
    toks = d.select(
        "doc_id",
        F.posexplode(F.expr("split(trim(lower(text)), '\\\\s+')")).alias(
            "pos0", "token"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    w_cover = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(DUP_SPAN_K - 1), 0
    )
    flagged = toks.join(starts, ["doc_id", "pos"], "left").withColumn(
        "covered",
        F.max(F.coalesce(F.col("start_flag"), F.lit(0))).over(w_cover),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("covered").cast("long").alias("n_removed"),
            F.concat_ws(
                " ",
                F.expr(
                    # whole-struct NULL when covered: collect_list
                    # skips NULLs, so only uncovered tokens are
                    # gathered, then sorted by position
                    "transform(array_sort(collect_list("
                    "CASE WHEN covered = 0 "
                    "THEN named_struct('pos', pos, 'token', token) END)), "
                    "s -> s.token)"
                ),
            ).alias("text_clean"),
        )
    )


CLEAN_SPANS_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
pos_rows AS (
  SELECT doc_id, t, unnest(range(1, len(t) - {DUP_SPAN_K - 2})) AS pos
  FROM base WHERE len(t) >= {DUP_SPAN_K}
),
occ AS (
  SELECT doc_id, pos,
         CAST(('0x' || substring(md5({_GRAM_WORDS}), 1, 15)) AS BIGINT)
           AS gram
  FROM pos_rows
),
starts AS (
  SELECT doc_id, pos FROM (
    SELECT *, count(*) OVER (PARTITION BY gram) > 1 AS is_dup FROM occ)
  WHERE is_dup
),
toks AS (
  SELECT doc_id, unnest(t) AS token,
         CAST(generate_subscripts(t, 1) AS INTEGER) AS pos
  FROM base
),
flagged AS (
  SELECT tk.doc_id, tk.pos, tk.token,
         max(CASE WHEN s.pos IS NULL THEN 0 ELSE 1 END)
           OVER (PARTITION BY tk.doc_id ORDER BY tk.pos
                 ROWS BETWEEN {DUP_SPAN_K - 1} PRECEDING AND CURRENT ROW)
           AS covered
  FROM toks tk LEFT JOIN starts s
    ON s.doc_id = tk.doc_id AND s.pos = tk.pos
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(covered) AS BIGINT) AS n_removed,
       coalesce(string_agg(CASE WHEN covered = 0 THEN token END, ' '
                           ORDER BY pos), '') AS text_clean
FROM flagged
GROUP BY doc_id
"""

# Staged registry surface — wire into plans/registry._MODULES (plus
# PRIORITY) in round 6 when driver-budget slots rotate free.
QUERIES = {
    "text_dup_spans": dup_span_stats,
    "corpus_clean_spans": clean_spans,
}
ORACLES = {
    "text_dup_spans": DUP_SPAN_ORACLE,
    "corpus_clean_spans": CLEAN_SPANS_ORACLE,
}
