"""BPE vocabulary induction over the corpus — the tokenizer-training
step of an LLM data pipeline, distributed.

Classic byte-pair encoding on the word-frequency table: start from
characters (+ an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair, emit the merge table a tokenizer ships.
The iterative-algorithm tier alongside k-means refinement and the PQ
Lloyd fit — and like them, oracle-paired by UNROLLING the rounds in
DuckDB SQL.

Representation trick that keeps BOTH engines exact: a word's symbol
sequence is a single space-separated string with boundary spaces
(``' h e l l o EOW '``). Pair counting is array expressions over
``split``; applying a merge is literal ``replace(s, ' a b ', ' ab ')``
— non-overlapping left-to-right, identical in Spark and DuckDB.

**Merge semantics (documented variant):** within a round, consecutive
occurrences of the winning pair that share a boundary space merge
ALTERNATELY (the replace consumes the shared space): ``a a a`` merges
its first pair only — same as reference BPE — but ``a b a b`` merges
only its first ``a b`` this round, where sequential reference BPE
(Sennrich's lookahead sub) would merge both; the skipped occurrence
merges in a later round if the pair stays on top. Deterministic,
oracle-exact, and distribution-friendly (chunk-parallel tokenizers
make the same trade inside runs), but NOT byte-identical to
single-threaded reference BPE on corpora where a pair abuts itself.

Scale shape: the corpus is touched ONCE (word-frequency aggregate —
one shuffle, map-side combined; BPE training is defined on this table,
never on raw text). Each round is one pair-count aggregate over the
DISTINCT-WORD table (vocabulary-sized, not corpus-sized) plus ONE
1-row argmax collect — the same driver-boundary scalar per iteration
as the k-means centroid fetch. At 100 TB the word table is a few
million rows regardless of corpus size; rounds cost O(vocab), and the
whole fit is embarrassingly smaller than the corpus scan that feeds
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

N_MERGES = 6
EOW = "EOW"  # end-of-word marker symbol (standard BPE </w>)

# Guarded for fully-merged words: sequence(1, size-1) DESCENDS when
# size < 2 (Spark yields [1, 0] and element_at(syms, 2) throws on a
# 1-element array) — a word whose whole symbol string became one
# merge token contributes no pairs, exactly like the oracle's
# generate_series(1, 0), which is empty. Not reachable in 6 rounds at
# the driver SFs, but the x10 corpus merges a 1-char word + EOW.
_PAIRS_EXPR = (
    "if(size(syms) >= 2, "
    "transform(sequence(1, size(syms) - 1), "
    "i -> named_struct('l', element_at(syms, i), "
    "'r', element_at(syms, i + 1))), "
    "cast(array() as array<struct<l:string,r:string>>))"
)


def word_freq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(symbol-string, freq) — the ONE corpus pass BPE trains on."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    words = d.select(
        F.explode(F.split(F.col("text"), "\\s+")).alias("word")
    ).where(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.lit(" "),
                F.regexp_replace(F.col("word"), "(.)", "$1 "),
                F.lit(EOW + " "),
            ).alias("s"),
            "freq",
        )
    )


def _best_pair(words: DataFrame):
    """argmax adjacent pair by corpus-weighted count; ties break on
    (l, r) ascending. One aggregate over the vocab table, 1-row fetch."""
    pairs = words.select(
        F.explode(
            F.expr(_PAIRS_EXPR.replace("syms", "split(trim(s), ' ')"))
        ).alias("p"),
        "freq",
    )
    top = (
        pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "l", "r")
        .limit(1)
        .collect()
    )
    return top[0] if top else None


# Fit-once memo per (application, sf_dir, rounds) — the codebook
# discipline from similarity/pq.py: the merge table is a model
# artifact; encode and repeated reports reuse one fit.
_MERGE_CACHE: dict[tuple[str, str, int], list[tuple]] = {}


def bpe_merges(spark: SparkSession, sf_dir: str,
               n_merges: int = N_MERGES) -> DataFrame:
    """The learned merge table: (rnd, left, right, merged, pair_count)."""
    schema = ("rnd int, left string, right string, merged string,"
              " pair_count long")
    key = (spark.sparkContext.applicationId, sf_dir, n_merges)
    cached = _MERGE_CACHE.get(key)
    if cached is not None:
        return spark.createDataFrame(cached, schema)
    # The fit table is VOCABULARY-sized (a few million rows at any
    # corpus scale — the docstring's scale shape), so the per-round
    # argmax jobs want a handful of fat partitions, not one task per
    # core of the corpus-scan parallelism: at 32 shuffle partitions
    # each of the N_MERGES rounds paid ~64 near-empty tasks of pure
    # scheduling overhead (r14 measurement). coalesce (narrow, no
    # shuffle) right after the one corpus-sized aggregate; override
    # via SPARK_GRAFT_BPE_FIT_PARTITIONS for a genuinely huge vocab.
    import os as _os

    fit_parts = int(_os.environ.get("SPARK_GRAFT_BPE_FIT_PARTITIONS", "4"))
    # Per-round materialization is a lazy localCheckpoint (r14, the
    # dedup_lsh_components precedent, guide §3.3/§5): a cached round
    # frame still carries the full select-chain lineage, so round N
    # re-analyzes N nested replaces; the checkpoint truncates each
    # round's plan to a LogicalRDD. ONE job per round as before: the
    # argmax aggregate materializes the round's blocks as a side
    # effect, and the context cleaner frees them — no unpersist
    # bookkeeping. A/B at sf0.1: 2.73 → 2.44 s median, rows equal.
    # loop_checkpoint: SPARK_GRAFT_RELIABLE_CHECKPOINT reroutes these
    # per-round blocks to reliable storage on clusters (r15; local
    # default unchanged — see checkpointing.py).
    from ..checkpointing import loop_checkpoint

    words = loop_checkpoint(
        word_freq_table(spark, sf_dir).coalesce(fit_parts)
    )
    out = []
    for rnd in range(1, n_merges + 1):
        best = _best_pair(words)
        if best is None:
            break
        merged = best.l + best.r
        out.append((rnd, best.l, best.r, merged, int(best.n)))
        if rnd == n_merges:
            break  # the post-final replace is never consumed
        # LITERAL replace (call_function, not regexp_replace):
        # symbols come from raw corpus text, so '.', '+', '$' are
        # legal symbols — as a regex pattern they would rewrite
        # unrelated sequences and diverge from the oracle's
        # literal replace().
        words = loop_checkpoint(
            words.select(
                F.call_function(
                    "replace",
                    F.col("s"),
                    F.lit(f" {best.l} {best.r} "),
                    F.lit(f" {merged} "),
                ).alias("s"),
                "freq",
            )
        )
    _MERGE_CACHE[key] = out
    return spark.createDataFrame(out, schema)




def _round_ctes(n_merges: int) -> str:
    """w0 -> b1/w1 -> ... -> b{n}: the unrolled merge rounds."""
    parts = []
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        parts.append(f"""
p{r} AS MATERIALIZED (
  SELECT pr.l, pr.r, sum(freq) AS n
  FROM (
    SELECT unnest(list_transform(range(1, len(syms)),
             i -> struct_pack(l := syms[i::INT], r := syms[(i + 1)::INT])))
             AS pr,
           freq
    FROM (SELECT string_split(trim(s), ' ') AS syms, freq FROM {prev})
  )
  GROUP BY pr.l, pr.r
),
b{r} AS MATERIALIZED (
  SELECT l, r, n, l || r AS merged
  FROM p{r} ORDER BY n DESC, l, r LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT replace(s, ' ' || (SELECT l FROM b{r}) || ' '
                    || (SELECT r FROM b{r}) || ' ',
                 ' ' || (SELECT merged FROM b{r}) || ' ') AS s,
         freq
  FROM {prev}
)""")
    return ",".join(parts)


def _vocab_oracle(n_merges: int = N_MERGES) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS rnd, l AS \"left\", r AS \"right\", merged, "
        f"CAST(n AS BIGINT) AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
WITH w0 AS MATERIALIZED (
  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{EOW} ' AS s,
         count(*) AS freq
  FROM (
    SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
  )
  WHERE word <> ''
  GROUP BY word
),
{_round_ctes(n_merges)}
{unions}
"""


VOCAB_ORACLE = _vocab_oracle()

def _encode_n_tok(merges):
    """The fitted-merge encode fold — per word, build the spaced
    symbol string, apply the K replaces in learned order, count
    symbols. ONE core shared by ``tokenize_bpe`` and the fit-quality
    eval (``vocab_eval_compression``), the _pair_lift_from_baskets
    discipline: the meter can't drift from the production encode."""

    def n_tok(w):
        s = F.concat(
            F.lit(" "),
            F.regexp_replace(w, "(.)", "$1 "),
            F.lit(EOW + " "),
        )
        for m in merges:
            s = F.call_function(
                "replace",
                s,
                F.lit(f" {m.left} {m.right} "),
                F.lit(f" {m.merged} "),
            )
        return F.size(F.split(F.trim(s), " "))

    return n_tok


def tokenize_bpe(spark: SparkSession, sf_dir: str,
                 n_merges: int = N_MERGES) -> DataFrame:
    """The encode step: apply the learned merge table to every document
    and count its true BPE tokens — what a dataloader budget actually
    consumes (the regex token counts in ``text/analysis.py`` are the
    cheap proxy; this is the real thing).

    The fitted merges are driver literals (the centroid/codebook
    pattern): encoding is then a PURE MAP — per word, build the spaced
    symbol string, apply the K replaces in learned order (merge
    priority = training order, the fast "apply BPE" path, sharing the
    training pass's documented run semantics), count symbols — no
    joins, no shuffle beyond the scan. The whole expression is built
    with Column lambdas and ``F.lit`` symbol literals — learned
    symbols are corpus text and must never be spliced into SQL/regex
    source (a symbol containing a quote or metacharacter would break
    or silently corrupt a stringly-built expression)."""
    merges = sorted(
        bpe_merges(spark, sf_dir, n_merges).collect(), key=lambda r: r.rnd
    )
    n_tok = _encode_n_tok(merges)

    d = load_table(spark, sf_dir, "documents", spread=True)
    words = F.filter(
        F.split(F.col("text"), r"\s+"), lambda w: w != F.lit("")
    )
    return d.select(
        "doc_id",
        # coalesce: NULL text must count 0 like an empty doc (the
        # oracle's outer-join + coalesce makes the same choice)
        F.coalesce(
            F.aggregate(words, F.lit(0), lambda acc, w: acc + n_tok(w)),
            F.lit(0),
        ).cast("long").alias("n_tokens_bpe"),
    )


def _tokenize_oracle(n_merges: int = N_MERGES) -> str:
    # Per-WORD token counts in a CTE (scalar subqueries are not valid
    # inside DuckDB lambdas, so no list_transform here), then joined
    # back through a doc→word unnest; LEFT JOIN from documents keeps
    # wordless/NULL docs at 0 like the Spark coalesce.
    inner = f"' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{EOW} '"
    for r in range(1, n_merges + 1):
        inner = (
            f"replace({inner}, ' ' || (SELECT l FROM b{r}) || ' ' || "
            f"(SELECT r FROM b{r}) || ' ', "
            f"' ' || (SELECT merged FROM b{r}) || ' ')"
        )
    return f"""
WITH w0 AS MATERIALIZED (
  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{EOW} ' AS s,
         count(*) AS freq
  FROM (
    SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
  )
  WHERE word <> ''
  GROUP BY word
),
{_round_ctes(n_merges)},
docwords AS MATERIALIZED (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
  FROM documents
),
tok AS MATERIALIZED (
  SELECT word, len(string_split(trim({inner}), ' ')) AS n_tok
  FROM (SELECT DISTINCT word FROM docwords WHERE word <> '')
),
counts AS (
  SELECT dw.doc_id, sum(t.n_tok) AS n
  FROM docwords dw JOIN tok t USING (word)
  GROUP BY dw.doc_id
)
SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens_bpe
FROM documents d LEFT JOIN counts c USING (doc_id)
"""


TOKENIZE_ORACLE = _tokenize_oracle()


def vocab_eval_compression(spark: SparkSession, sf_dir: str,
                           n_merges: int = N_MERGES) -> DataFrame:
    """Tokenizer-fit eval: per-language compression of the learned merges.

    How well the fitted BPE vocabulary compresses the corpus it will
    tokenize.

    The vocab tier's EVAL member — the ``ann_recall_eval`` /
    ``dedup_recall_eval`` / ``rec_eval_ndcg`` discipline applied to
    the tokenizer: train+encode isn't done until fit quality is a
    queryable number. Per ``lang``: word/char/BPE-token totals, then
    the metrics a tokenizer team actually reads — tokens-per-word
    (fertility), chars-per-token, compression ratio vs the unmerged
    character baseline (chars + EOW per word), and the fraction of
    word occurrences the vocabulary covers with a SINGLE token. A
    merge table trained on one distribution shows its bias here:
    languages the merges were not induced from compress worse, which
    is exactly what the per-lang rows surface.

    Scale shape: the encode fold is the shared ``_encode_n_tok`` pure
    map (fitted merges are driver literals); per-doc totals are array
    expressions over ONE bound ``toks`` array (multi-use non-cheap
    projection — CollapseProject keeps it materialized, so the
    replace chain runs once per word, SCALE §4.1); the report is one
    5-group aggregate. Zero joins, zero Python, one corpus scan."""
    merges = sorted(
        bpe_merges(spark, sf_dir, n_merges).collect(), key=lambda r: r.rnd
    )
    n_tok = _encode_n_tok(merges)

    d = load_table(spark, sf_dir, "documents", spread=True)
    # wordless docs (empty, whitespace-only or NULL text) form no
    # per-lang rows in the oracle's unnest — drop them with the CHEAP
    # scan-level equivalent (has a non-whitespace char ⟺ has a word)
    # so the pushed-down predicate never re-evaluates the split
    # pipeline (SCALE §4.1)
    d = d.where(F.col("text").rlike(r"\S"))
    words = F.filter(
        F.split(F.col("text"), r"\s+"), lambda w: w != F.lit("")
    )
    bound = d.select("lang", words.alias("ws")).select(
        "lang",
        F.size("ws").alias("w"),
        F.aggregate(
            F.transform("ws", F.length), F.lit(0), lambda a, x: a + x
        ).alias("c"),
        F.transform("ws", n_tok).alias("toks"),
    )
    per_doc = bound.select(
        "lang",
        "w",
        "c",
        F.aggregate("toks", F.lit(0), lambda a, x: a + x).alias("t"),
        F.size(F.filter("toks", lambda t: t == F.lit(1))).alias("s1"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.sum("w").cast("long").alias("n_words"),
        F.sum("c").cast("long").alias("n_chars"),
        F.sum("t").cast("long").alias("n_tokens_bpe"),
        F.sum("s1").cast("long").alias("n_single_token_words"),
    )
    # denominators are structurally >= 1 (a group exists only via >= 1
    # word, and every word encodes to >= 1 token) — plain division is
    # ANSI-safe
    return agg.select(
        "lang",
        "n_words",
        "n_chars",
        "n_tokens_bpe",
        "n_single_token_words",
        F.round(
            F.col("n_tokens_bpe") / F.col("n_words"), 6
        ).alias("tokens_per_word"),
        F.round(
            F.col("n_chars") / F.col("n_tokens_bpe"), 6
        ).alias("chars_per_token"),
        F.round(
            (F.col("n_chars") + F.col("n_words"))
            / F.col("n_tokens_bpe"),
            6,
        ).alias("compression_ratio"),
        F.round(
            F.col("n_single_token_words") / F.col("n_words"), 6
        ).alias("single_token_frac"),
    )


def _vocab_eval_oracle(n_merges: int = N_MERGES) -> str:
    # Same round CTEs and per-distinct-word encode as the tokenize
    # oracle; the join back through doc→word unnest carries lang, and
    # the report aggregates word OCCURRENCES (count(*) over docwords),
    # matching the Spark per-doc array totals.
    inner = f"' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{EOW} '"
    for r in range(1, n_merges + 1):
        inner = (
            f"replace({inner}, ' ' || (SELECT l FROM b{r}) || ' ' || "
            f"(SELECT r FROM b{r}) || ' ', "
            f"' ' || (SELECT merged FROM b{r}) || ' ')"
        )
    return f"""
WITH w0 AS MATERIALIZED (
  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '{EOW} ' AS s,
         count(*) AS freq
  FROM (
    SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
  )
  WHERE word <> ''
  GROUP BY word
),
{_round_ctes(n_merges)},
docwords AS MATERIALIZED (
  SELECT lang, unnest(string_split_regex(text, '\\s+')) AS word
  FROM documents
),
tok AS MATERIALIZED (
  SELECT word, len(word) AS n_chars,
         len(string_split(trim({inner}), ' ')) AS n_tok
  FROM (SELECT DISTINCT word FROM docwords WHERE word <> '')
),
agg AS (
  SELECT dw.lang,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(t.n_chars) AS BIGINT) AS n_chars,
         CAST(sum(t.n_tok) AS BIGINT) AS n_tokens_bpe,
         CAST(sum(CASE WHEN t.n_tok = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_single_token_words
  FROM docwords dw JOIN tok t USING (word)
  GROUP BY 1
)
SELECT lang, n_words, n_chars, n_tokens_bpe, n_single_token_words,
       round(CAST(n_tokens_bpe AS DOUBLE) / n_words, 6)
         AS tokens_per_word,
       round(CAST(n_chars AS DOUBLE) / n_tokens_bpe, 6)
         AS chars_per_token,
       round(CAST(n_chars + n_words AS DOUBLE) / n_tokens_bpe, 6)
         AS compression_ratio,
       round(CAST(n_single_token_words AS DOUBLE) / n_words, 6)
         AS single_token_frac
FROM agg
"""


VOCAB_EVAL_ORACLE = _vocab_eval_oracle()

# vocab_bpe_merges graduated to the registry in r7 (a slot opened when
# feature_assembly_onepass retired to its verified-equal chain twin) —
# it is the tier's headline: distributed BPE training 10.8x faster
# than the DuckDB oracle at sf0.1. text_tokenize_bpe graduated in r8
# (label_churned_anti retired to its verified-equal outer-join twin),
# completing the registered train+encode tokenizer pair — the
# token-level analog of the reference's featindex encode chain
# (LR/TFRecord_process.py:17-35). tests/test_vocab.py holds both to
# driver rigor regardless.
QUERIES = {
    "vocab_bpe_merges": bpe_merges,
    "text_tokenize_bpe": tokenize_bpe,
    # r12: the tier's eval member graduates (staged since r10, green
    # in STAGED_CORRECTNESS throughout; the slot was freed by retiring
    # dedup_incremental_materialized to its verified-equal inline
    # twin) — the registered surface now carries the full BPE
    # train/encode/eval triad.
    "vocab_eval_compression": vocab_eval_compression,
}
ORACLES = {
    "vocab_bpe_merges": VOCAB_ORACLE,
    "text_tokenize_bpe": TOKENIZE_ORACLE,
    "vocab_eval_compression": VOCAB_EVAL_ORACLE,
}
STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict = {}
