"""Text-analysis operators over the `documents` table.

Training-data-pipeline primitives (north star, BASELINE.json): token
counting, quality scoring, language-ID heuristics, and document
fingerprinting. Everything is built from JVM-side expressions
(split/transform/aggregate/regexp) — no Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with no shuffle
(all operators here are per-row map work over the document scan).

Ratio outputs are unrounded int/int IEEE divisions (bit-deterministic
across engines); weighted quality scores use an explicitly
parenthesized expression tree so both engines evaluate the identical
float op sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
_EN = ("the", "a", "and", "of", "to", "is")
_DE = ("der", "die", "das", "und", "ist", "ein")
_FR = ("le", "la", "et", "est", "un", "une")


def _tokens(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def _quality(text_col):
    """Single source of truth for the quality score and its parts
    (ADVICE r3: the 0.4·length + 0.3·punct + 0.3·stopword expression
    was duplicated across three queries and their oracles; a tweak to
    one copy would silently de-sync query and oracle). The SQL twin is
    ``_QUALITY_SQL`` below — change them in lockstep; three
    oracle-paired registry queries assert they agree.

    For a zero-char doc the punct ratio is 0/0: under Spark 4's
    default ANSI mode a plain ``/`` THROWS DIVIDE_BY_ZERO at runtime —
    one empty crawl page would kill a 100 TB job — so the ratios use
    ``try_divide``, which yields NULL; the quality score is then NULL
    and every ``>=`` comparison is falsy — the doc routes to the
    lowest tier / is filtered out. The SQL twin uses NULLIF to
    reproduce exactly that (DuckDB would otherwise produce IEEE NaN,
    which its total order sorts ABOVE every threshold)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    n_alnum = F.length(
        F.regexp_replace(text_col, r"[^a-zA-Z0-9\s]", "")
    ).cast("long")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_EN))).cast("long")
    punct_ratio = F.try_divide(n_chars - n_alnum, n_chars)
    stop_ratio = F.try_divide(stop_hits, n_tokens)
    quality = (
        (F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0)))
        + (F.lit(0.3) * (F.lit(1.0) - punct_ratio))
        + (F.lit(0.3) * stop_ratio)
    )
    return {
        "toks": toks,
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "n_alnum": n_alnum,
        "stop_hits": stop_hits,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "quality": quality,
    }


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (length / punctuation /
    stopword ratios combined into a fixed-weight score)."""
    d = load_table(spark, sf_dir, "documents")
    q = _quality(F.col("text"))
    return d.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["n_chars"].alias("n_chars_calc"),
        q["stop_hits"].alias("stopword_hits"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stop_ratio"].alias("stopword_ratio"),
        q["quality"].alias("quality_score"),
    )


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: count per-language stopword hits and
    take the argmax (CJK presence short-circuits to 'zh')."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def hits(words):
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    en, de, fr = hits(_EN), hits(_DE), hits(_FR)
    has_cjk = F.col("text").rlike(r"[一-鿿]")
    guess = (
        F.when(has_cjk, "zh")
        .when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return d.select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        guess.alias("lang_guess"),
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letter runs | single digits | single punctuation —
    the GPT-2 pre-tokenizer shape without the merges table). The
    chars-per-token ratio is the usual budget estimator for LLM
    training data. Pure regexp work — stays in codegen, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(_tokens(F.col("text"))).cast("long")
    bpe = F.expr(
        r"size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0))"
    ).cast("long")
    n_chars = F.length("text").cast("long")
    return d.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        n_chars.alias("n_chars_calc"),
        # try_divide: a zero-token doc is NULL, not an ANSI-mode crash.
        F.try_divide(n_chars, bpe).alias("chars_per_token"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint: lower → strip punctuation → collapse
    whitespace → md5. The canonical pre-key for exact dedup."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


QUALITY_THRESHOLD = 0.5


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pass — the composition a training-data
    pipeline actually ships: quality-score filter → language filter
    (en) → exact dedup on the normalization fingerprint (keep lowest
    doc_id). One scan, one shuffle (the dedup groupBy); every stage is
    the same expression used by its standalone query, so this also
    pins the operators' composability."""
    d = load_table(spark, sf_dir, "documents")
    q = _quality(F.col("text"))
    toks, quality = q["toks"], q["quality"]
    en = q["stop_hits"]
    de = F.size(F.filter(toks, lambda t: t.isin(*_DE))).cast("long")
    fr = F.size(F.filter(toks, lambda t: t.isin(*_FR))).cast("long")
    is_en = (
        ~F.col("text").rlike(r"[一-鿿]") & (en >= de) & (en >= fr) & (en > 0)
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    scored = d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        quality.alias("quality_score"),
        is_en.alias("is_en"),
    ).where(F.col("is_en") & (F.col("quality_score") >= QUALITY_THRESHOLD))
    return scored.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.max("quality_score").alias("quality_score"),
    )


# Quality-weighted downsampling tiers: (tier, min_quality, keep_rate).
# The standard curation move — keep everything above the quality bar,
# thin the middle, keep a trace of the tail for distribution coverage.
SAMPLE_TIERS = (
    ("high", 0.6, 1.0),
    ("mid", QUALITY_THRESHOLD, 0.5),
    ("low", None, 0.1),
)


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-stratified corpus sampling: each doc's
    tier comes from the shared quality expression, membership from the
    md5-prefix threshold filter (same portable sampler as
    ``sampled_orders`` — reproducible across engines, retries, and
    repartitions; a seeded RNG sample is neither). Output is the
    per-tier budget accounting (docs and chars kept vs total) a
    pipeline uses to steer token budgets. One scan, one aggregate."""
    from ..operators.relational import hash_threshold

    d = load_table(spark, sf_dir, "documents")
    q = _quality(F.col("text"))
    n_chars, quality = q["n_chars"], q["quality"]
    tier, thr = None, None
    for name, min_q, rate in SAMPLE_TIERS:
        t = F.lit(hash_threshold(rate))
        if min_q is None:
            tier = tier.otherwise(name)
            thr = thr.otherwise(t)
        elif tier is None:
            tier = F.when(quality >= min_q, name)
            thr = F.when(quality >= min_q, t)
        else:
            tier = tier.when(quality >= min_q, name)
            thr = thr.when(quality >= min_q, t)
    kept = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < thr
    return (
        d.select(
            tier.alias("tier"),
            n_chars.alias("n_chars"),
            kept.alias("kept"),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("n_chars"))), F.lit(0)
            ).alias("chars_kept"),
        )
    )


TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-k terms per document — the standard corpus-weighted
    term salience primitive (keyword extraction, near-dup explanation,
    quality probes).

    Plan shape, all linear: explode tokens → per-(doc, term) count (one
    shuffle) → document frequency as a WINDOW count over term (one
    shuffle, and — unlike a groupBy + join back — the tf subtree is
    evaluated once: a join's two consumers re-run the explode+aggregate
    on both DAG branches) → per-doc top-k window. The corpus size joins
    in as a broadcast single-row aggregate, keeping the whole thing one
    declarative plan (no driver-side count). Scores round to 6dp BEFORE
    ranking so ordering (desc score, asc term) is identical in both
    engines."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    wt = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(wt))
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1)
                        / (F.col("df") + 1).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


CHUNK_TOKENS = 64


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget document chunking — the context-window
    splitting step every LLM training/embedding pipeline runs before
    tokenization proper. Each doc becomes ceil(n_tokens/CHUNK_TOKENS)
    rows of at most CHUNK_TOKENS whitespace tokens, chunk_id 0-based
    in document order.

    Scale shape: pure per-row map work — tokenize once into a
    materialized array column (the two consumers below reference the
    SAME attribute; inlining the split into both would be the §4.1
    duplication class), then one posexplode. No shuffle at all: at
    100 TB this runs scan-speed and parallelizes per file split.
    NULL texts are dropped at the scan (a NULL-token chunk row is
    meaningless); empty strings keep the engines' shared
    one-empty-token artifact (split('') = [''] in both) so parity is
    exact rather than special-cased."""
    d = load_table(spark, sf_dir, "documents", spread=True).where(
        F.col("text").isNotNull()
    )
    c = CHUNK_TOKENS
    toks_df = d.select("doc_id", _tokens(F.col("text")).alias("toks"))
    return (
        toks_df.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(floor((size(toks) - 1) "
                    f"/ {c}) as int)), i -> slice(toks, i * {c} + 1, {c}))"
                )
            ).alias("chunk_id", "chunk_toks"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join("chunk_toks", " ").alias("chunk_text"),
            F.size("chunk_toks").cast("long").alias("n_tokens"),
        )
    )


# PII patterns scrubbed before a corpus ships to training: emails,
# international-ish phone numbers, and 13-19-digit card-like runs.
# Deliberately simple regexes — the op's value is the Spark shape
# (scan-speed expression-only rewrite + audit counts); swapping in a
# production pattern set changes no plan.
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    # card before phone: an unbroken 13-19-digit run also satisfies the
    # looser phone pattern, and the earlier rewrite wins the span.
    ("card", r"[0-9]{13,19}"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]"),
)


def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance scrub every shipped training
    corpus runs: replace email/phone/card-shaped spans with typed
    placeholders and emit per-doc audit counts (how many of each kind
    were hit — the number a data-governance report aggregates).

    Scale shape: a chain of regexp_replace/regexp_count expressions —
    per-row map work in whole-stage codegen, zero shuffle, scan-speed
    at 100 TB. Replacements apply in declaration order (email, then
    card, then phone — each more specific pattern consumes its span
    before a looser one can); audit counts are taken per kind on the
    ORIGINAL text, so an ambiguous span (a bare digit run is both
    card- and phone-shaped) is visible in BOTH counters even though
    only the first pattern rewrites it."""
    d = load_table(spark, sf_dir, "documents", spread=True).where(
        F.col("text").isNotNull()
    )
    redacted = F.col("text")
    counts = []
    for kind, pat in _PII_PATTERNS:
        counts.append(
            F.regexp_count("text", F.lit(pat)).cast("long").alias(
                f"n_{kind}"
            )
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind}>")
    return d.select("doc_id", redacted.alias("redacted_text"), *counts)


def text_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the CCNet/perplexity-bucket
    quality signal (Wenzek et al. 2020): score each document by the
    mean negative log-probability of its tokens under a unigram model
    fit on the corpus itself (add-one smoothed). Gibberish and
    boilerplate-heavy docs score high (their tokens are rare or the
    doc is dominated by atypically-distributed tokens); the score is
    the usual axis for keep/thin/drop bucketing next to
    ``text_repetition`` and the quality score.

    Spark shape: pass 1 builds the vocabulary — explode tokens,
    ONE (token) hash aggregate (map-side partial combine carries most
    of the weight); the per-doc pass joins the token stream to the
    vocab on the token key and averages per doc — a shuffle join whose
    build side is the vocab table (dictionary-sized, not corpus-sized;
    at 100 TB it lands broadcast-able after a frequency cutoff).
    log() is the same natural log in both engines; the mean is over a
    6dp-rounded per-token logprob so the float fold is order-stable."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    toks = d.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # Corpus totals as a broadcast 1-row scalar (the calibration-tier
    # report pattern), NOT an unpartitioned window: a global window
    # moves the whole vocab table to ONE task — a straggler once the
    # vocabulary is web-scale — while the aggregate is a map-side
    # combine plus a 1-row broadcast.
    tot = vocab.agg(
        F.sum("tf").cast("long").alias("n_corpus"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    totals = vocab.crossJoin(F.broadcast(tot))
    # add-one smoothing: p(t) = (tf + 1) / (N + |V|)
    scored_vocab = totals.select(
        "tok",
        F.round(
            -F.log((F.col("tf") + 1) / (F.col("n_corpus") + F.col("n_vocab"))),
            6,
        ).alias("nll"),
    )
    return (
        toks.join(scored_vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("mean_nll"),
        )
    )


# Target language mix for corpus_mix — the per-domain weights a
# pretraining recipe pins (shares sum to 1; a lang absent from the map
# gets share 0 → dropped).
MIX_TARGETS = (
    ("en", 0.7), ("de", 0.1), ("fr", 0.1), ("es", 0.05), ("zh", 0.05),
)


def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixing — resample the corpus toward a TARGET
    distribution (here per-lang; per-source works identically): the
    mixing step every pretraining recipe runs after curation, where
    each domain's keep-rate is derived FROM the data,
    rate_d = min(1, target_share_d · N / n_d), instead of being a
    fixed constant like the quality-tier sampler's.

    Spark shape: pass 1 is a column-pruned scan aggregating per-domain
    counts (a handful of rows), the global N is a window sum over that
    tiny frame, and the derived rates broadcast-join back onto the
    scan for the deterministic md5-threshold count — the same
    engine-independent sampler as ``corpus_sample_stratified``, but
    with the threshold COMPUTED in-plan (integer compare against
    round(rate·16⁴)) rather than precomputed in Python, since the rate
    depends on the data. Two passes over the table, both pure
    map+aggregate; no full-data shuffle.

    A domain whose target exceeds its share caps at rate 1 (keep all):
    a keep/drop sampler cannot upsample — the repetition factor for
    true upsampling is ``target_share · N / n`` read off the ``rate``
    column where it saturates."""
    d = load_table(spark, sf_dir, "documents", spread=True).select(
        "lang",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("long").alias("hk"),
    )
    target = F.lit(0.0)
    for lang, share in MIX_TARGETS:
        target = F.when(F.col("lang") == lang, F.lit(share)).otherwise(
            target
        )
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    # Global window over the ALREADY-AGGREGATED per-lang frame — at
    # most a few hundred rows land in the single window task at any
    # corpus size, so this is NOT the text_logprob hazard (there the
    # window input was the vocab table). The broadcast-scalar form was
    # tried in r10 and planned WORSE: the agg branch re-scanned
    # documents without exchange reuse, tripling the heavy scan.
    from pyspark.sql import Window

    stats = stats.withColumn(
        "corpus_n", F.sum("n_total").over(Window.partitionBy())
    )
    rates = stats.select(
        "lang",
        "n_total",
        target.alias("target_share"),
        F.least(
            F.lit(1.0),
            F.round(target * F.col("corpus_n") / F.col("n_total"), 6),
        ).alias("rate"),
    ).withColumn("thr", F.round(F.col("rate") * 65536, 0).cast("long"))
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.first("n_total").alias("n_total"),
            F.first("target_share").alias("target_share"),
            F.first("rate").alias("rate"),
            F.sum(
                F.when(F.col("hk") < F.col("thr"), 1).otherwise(0)
            ).cast("long").alias("n_kept"),
        )
    )


REPETITION_DUP_TOKEN_MAX = 0.70
REPETITION_TOP_TOKEN_MAX = 0.30
REPETITION_TOP_BIGRAM_MAX = 0.18


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter — the Gopher rules (Rae et al.
    2021 §A1.1): boilerplate, keyword-stuffed spam and degenerate
    generations betray themselves through repeated tokens/n-grams.
    Per doc: duplicate-token fraction (1 − distinct/total), most-
    frequent-token fraction, most-frequent-bigram fraction, and the
    combined ``repetitive`` verdict against the published thresholds
    (0.70 / 0.30 / 0.18).

    Scale shape: EXPRESSION-ONLY — the counts fold over the token
    array in whole-stage codegen (array_distinct + filter-count per
    distinct token), zero shuffle, scan-speed at 100 TB. Per-row cost
    is O(distinct × len) — bounded by document length, embarrassingly
    parallel; a corpus of pathological multi-MB docs would swap this
    for the explode + groupBy form (two shuffles, same answer).

    Empty docs: token/bigram ratios go NULL through try_divide (the
    same ANSI-safe route as ``_quality``) and the verdict coalesces to
    false — an empty doc is not repetitive; the ORACLE mirrors with
    NULLIF."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    staged = d.select("doc_id", _tokens(F.col("text")).alias("toks"))
    staged = staged.select(
        "doc_id",
        "toks",
        F.size("toks").cast("long").alias("n_tokens"),
        F.expr("size(array_distinct(toks))").cast("long").alias(
            "n_distinct"
        ),
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN "
            "transform(sequence(1, size(toks) - 1), "
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            " ELSE CAST(array() AS array<string>) END"
        ).alias("bigrams"),
    )
    counted = staged.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.size("bigrams").cast("long").alias("n_bigrams"),
        F.expr(
            "array_max(transform(array_distinct(toks), "
            "t -> size(filter(toks, x -> x = t))))"
        ).cast("long").alias("top_token_cnt"),
        F.expr(
            "array_max(transform(array_distinct(bigrams), "
            "g -> size(filter(bigrams, x -> x = g))))"
        ).cast("long").alias("top_bigram_cnt"),
    )
    dup_frac = F.round(
        F.try_divide(F.col("n_tokens") - F.col("n_distinct"), F.col("n_tokens")), 6
    )
    top_tok = F.round(F.try_divide("top_token_cnt", "n_tokens"), 6)
    top_big = F.round(F.try_divide("top_bigram_cnt", "n_bigrams"), 6)
    ratios = counted.select(
        "doc_id",
        "n_tokens",
        dup_frac.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        top_big.alias("top_bigram_frac"),
    )
    verdict = F.coalesce(
        (F.col("dup_token_frac") > REPETITION_DUP_TOKEN_MAX)
        | (F.col("top_token_frac") > REPETITION_TOP_TOKEN_MAX)
        | (F.col("top_bigram_frac") > REPETITION_TOP_BIGRAM_MAX),
        F.lit(False),
    )
    return ratios.withColumn("repetitive", verdict)


PACK_BUDGET = 256


def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing — concatenate documents in a
    deterministic order and cut training rows every PACK_BUDGET
    tokens (the concatenate-and-split packing LLM pretraining uses to
    avoid padding waste). A document belongs to the bin where it
    STARTS (docs longer than the budget spill into following bins but
    are accounted once, at their start — the bookkeeping convention
    that keeps the op a pure window expression). Output is the
    per-bin manifest (docs, tokens, first doc) a dataloader shards by.

    Scale shape: packing is per-`source` (the crawl shard), so the
    running token count is a window PARTITIONED by source — one
    linear shuffle, embarrassingly parallel across shards, never a
    global single-partition sort (the naive global-order form would
    serialize the corpus through one task at 100 TB)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", spread=True).where(
        F.col("text").isNotNull()
    )
    n_tokens = F.size(_tokens(F.col("text"))).cast("long")
    staged = d.select("doc_id", "source", n_tokens.alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id")
    packed = staged.withColumn(
        "cum_after", F.sum("n_tokens").over(w)
    ).withColumn(
        "bin_id",
        F.floor(
            (F.col("cum_after") - F.col("n_tokens")) / F.lit(PACK_BUDGET)
        ).cast("long"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


def _hits_sql(words) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        "CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"t -> t IN ({inlist}))) AS BIGINT)"
    )


# SQL twins of _quality() — change in lockstep with the Python
# expression above (three oracle-paired queries assert they agree).
# NULLIF makes degenerate docs (0 chars / 0 tokens) produce NULL
# exactly like Spark's divide-by-zero, instead of DuckDB's IEEE NaN,
# whose total order sorts ABOVE every quality threshold (ADVICE r3).
_QPARTS_SQL = f"""SELECT doc_id, text,
    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_alnum,
    {_hits_sql(_EN)} AS stop_hits
  FROM documents"""

_QUALITY_SQL = (
    "(0.4 * least(n_tokens / 100.0, 1.0))"
    " + (0.3 * (1.0 - (n_chars - n_alnum) / CAST(NULLIF(n_chars, 0) AS DOUBLE)))"
    " + (0.3 * (stop_hits / CAST(NULLIF(n_tokens, 0) AS DOUBLE)))"
)


QUERIES = {
    "text_stats": text_stats,
    "text_lang_id": lang_id_heuristic,
    "text_token_counts": token_counts,
    "text_fingerprint": doc_fingerprint,
    "text_tfidf_topk": tfidf_top_terms,
    "corpus_curation": corpus_curation,
    "corpus_sample_stratified": corpus_sample_stratified,
    "text_chunks": text_chunks,
    "corpus_pack": corpus_pack,
    "text_redact": text_redact,
    "text_repetition": text_repetition,
    "corpus_mix": corpus_mix,
    "text_logprob": text_logprob,
}


def _sample_stratified_oracle() -> str:
    from ..operators.relational import hash_threshold

    tier_case, thr_case = [], []
    for name, min_q, rate in SAMPLE_TIERS:
        cond = f"WHEN q >= {min_q} THEN" if min_q is not None else "ELSE"
        tier_case.append(f"{cond} '{name}'")
        thr_case.append(f"{cond} '{hash_threshold(rate)}'")
    return f"""
WITH p AS ({_QPARTS_SQL}),
q AS (
  SELECT doc_id, n_chars, {_QUALITY_SQL} AS q
  FROM p
),
s AS (
  SELECT n_chars,
         CASE {' '.join(tier_case)} END AS tier,
         CASE {' '.join(thr_case)} END AS thr,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hk
  FROM q
)
SELECT tier, count(*) AS n_total,
       CAST(count(*) FILTER (WHERE hk < thr) AS BIGINT) AS n_kept,
       CAST(COALESCE(sum(n_chars) FILTER (WHERE hk < thr), 0) AS BIGINT)
         AS chars_kept
FROM s GROUP BY tier
"""

ORACLES = {
    "text_tfidf_topk": f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * (ln((n.n_docs + 1) / CAST(d.df + 1 AS DOUBLE)) + 1.0),
               6) AS tfidf
  FROM tf JOIN dfreq d ON tf.term = d.term CROSS JOIN n
)
SELECT doc_id, term, tf, tfidf, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored)
WHERE rank <= {TFIDF_TOP_K}
""",
    "text_stats": f"""
WITH t AS ({_QPARTS_SQL})
SELECT doc_id, n_tokens, n_chars AS n_chars_calc,
  stop_hits AS stopword_hits,
  (n_chars - n_alnum) / CAST(NULLIF(n_chars, 0) AS DOUBLE) AS punct_ratio,
  stop_hits / CAST(NULLIF(n_tokens, 0) AS DOUBLE) AS stopword_ratio,
  {_QUALITY_SQL} AS quality_score
FROM t
""",
    "text_lang_id": f"""
WITH t AS (
  SELECT doc_id, text,
    {_hits_sql(_EN)} AS en_hits,
    {_hits_sql(_DE)} AS de_hits,
    {_hits_sql(_FR)} AS fr_hits
  FROM documents
)
SELECT doc_id, en_hits, de_hits, fr_hits,
  CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
       WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
       WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
       WHEN fr_hits > 0 THEN 'fr'
       ELSE 'und' END AS lang_guess
FROM t
""",
    "text_token_counts": """
WITH t AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
    CAST(length(text) AS BIGINT) AS n_chars_calc
  FROM documents
)
SELECT doc_id, ws_tokens, bpe_tokens, n_chars_calc,
       n_chars_calc / CAST(NULLIF(bpe_tokens, 0) AS DOUBLE) AS chars_per_token
FROM t
""",
    "text_fingerprint": """
WITH t AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                        '\\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS fingerprint, CAST(length(norm) AS BIGINT) AS norm_len
FROM t
""",
    "corpus_curation": f"""
WITH p AS ({_QPARTS_SQL}),
t AS (
  SELECT p.*,
    {_hits_sql(_DE)} AS de_hits,
    {_hits_sql(_FR)} AS fr_hits,
    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                            '\\s+', ' ', 'g'))) AS fingerprint
  FROM p
),
scored AS (
  SELECT doc_id, fingerprint, {_QUALITY_SQL} AS quality_score
  FROM t
  WHERE NOT regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]')
    AND stop_hits >= de_hits AND stop_hits >= fr_hits AND stop_hits > 0
)
SELECT fingerprint, min(doc_id) AS doc_id, count(*) AS n_copies,
       max(quality_score) AS quality_score
FROM scored WHERE quality_score >= {QUALITY_THRESHOLD}
GROUP BY fingerprint
""",
}

ORACLES["corpus_sample_stratified"] = _sample_stratified_oracle()

# DuckDB list slicing toks[a:b] is 1-based with an inclusive,
# auto-clamped end — exactly Spark's slice(toks, a, len) semantics.
ORACLES["text_chunks"] = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(floor((len(toks) - 1) / {CHUNK_TOKENS}) AS BIGINT) + 1)) AS i
  FROM t
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
       array_to_string(toks[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}], ' ')
         AS chunk_text,
       CAST(len(toks[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}]) AS BIGINT)
         AS n_tokens
FROM idx
"""

def _redact_oracle() -> str:
    """Built from the SAME _PII_PATTERNS table as the Spark query so
    the pattern sets cannot de-sync. DuckDB's RE2 runs perl-style
    leftmost/greedy like Java's regex for these patterns; 'g' makes
    regexp_replace global to match Spark's default."""
    redacted = "text"
    counts = []
    for kind, pat in _PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '<{kind}>', 'g')"
        counts.append(
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
            f" AS n_{kind}"
        )
    return (
        f"SELECT doc_id, {redacted} AS redacted_text, "
        + ", ".join(counts)
        + " FROM documents WHERE text IS NOT NULL"
    )


ORACLES["text_redact"] = _redact_oracle()

ORACLES["corpus_pack"] = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum_after
  FROM t
)
SELECT source,
       CAST(floor((cum_after - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc
FROM c GROUP BY 1, 2
"""

# DuckDB twin of text_repetition: same tokenization, same fold shape
# (list_distinct + per-distinct filter-count), NULLIF where Spark uses
# try_divide. duckdb's range(1, n) is empty for n <= 1, so the Spark
# CASE guard (sequence() would descend) needs no SQL counterpart —
# both sides yield zero bigrams for single-token docs.
ORACLES["text_repetition"] = f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
b AS (
  SELECT doc_id, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
  FROM t
),
c AS (
  SELECT doc_id, n_tokens, n_distinct,
         CAST(len(bigrams) AS BIGINT) AS n_bigrams,
         CAST(list_max(list_transform(list_distinct(toks),
              tk -> len(list_filter(toks, x -> x = tk)))) AS BIGINT)
           AS top_token_cnt,
         CAST(list_max(list_transform(list_distinct(bigrams),
              g -> len(list_filter(bigrams, x -> x = g)))) AS BIGINT)
           AS top_bigram_cnt
  FROM b
),
r AS (
  SELECT doc_id, n_tokens,
    round((n_tokens - n_distinct)
          / CAST(NULLIF(n_tokens, 0) AS DOUBLE), 6) AS dup_token_frac,
    round(top_token_cnt
          / CAST(NULLIF(n_tokens, 0) AS DOUBLE), 6) AS top_token_frac,
    round(top_bigram_cnt
          / CAST(NULLIF(n_bigrams, 0) AS DOUBLE), 6) AS top_bigram_frac
  FROM c
)
SELECT doc_id, n_tokens, dup_token_frac, top_token_frac,
       top_bigram_frac,
       COALESCE(dup_token_frac > {REPETITION_DUP_TOKEN_MAX}
                OR top_token_frac > {REPETITION_TOP_TOKEN_MAX}
                OR top_bigram_frac > {REPETITION_TOP_BIGRAM_MAX},
                false) AS repetitive
FROM r
"""

# DuckDB twin of corpus_mix. Decimal literals CAST to DOUBLE so the
# rate math is the same IEEE sequence as Spark's; the hex md5 prefix
# parses via the '0x' string cast (= Spark's conv(hk, 16, 10)).
_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN CAST({share} AS DOUBLE)"
    for lang, share in MIX_TARGETS
) + " ELSE CAST(0.0 AS DOUBLE) END"

ORACLES["corpus_mix"] = f"""
WITH d AS (
  SELECT lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) AS hk
  FROM documents
),
stats AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM d GROUP BY lang
),
rates AS (
  SELECT lang, n_total,
         {_MIX_CASE} AS target_share,
         least(1.0, round({_MIX_CASE}
               * (SELECT CAST(sum(n_total) AS DOUBLE) FROM stats)
               / n_total, 6)) AS rate
  FROM stats
),
r2 AS (
  SELECT *, CAST(round(rate * 65536) AS BIGINT) AS thr FROM rates
)
SELECT d.lang, r.n_total, r.target_share, r.rate,
       CAST(count(*) FILTER (WHERE d.hk < r.thr) AS BIGINT) AS n_kept
FROM d JOIN r2 r USING (lang)
GROUP BY d.lang, r.n_total, r.target_share, r.rate
"""

# DuckDB twin of text_logprob: same tokenization, same add-one
# unigram model. Corpus totals CAST to DOUBLE so the probability is
# the identical double division of exact integers in both engines;
# per-token nll rounds to 6dp before the mean.
ORACLES["text_logprob"] = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY tok
),
tot AS (
  SELECT CAST(sum(tf) AS DOUBLE) AS n_corpus,
         CAST(count(*) AS DOUBLE) AS n_vocab
  FROM vocab
),
sv AS (
  SELECT tok, round(-ln((tf + 1) / (n_corpus + n_vocab)), 6) AS nll
  FROM vocab CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(nll), 6) AS mean_nll
FROM toks JOIN sv USING (tok)
GROUP BY doc_id
"""

# Recipe-pinned LM-score ceiling for the composed keep decision: docs
# whose mean token nll exceeds it are "too surprising" under the
# corpus unigram model (gibberish / far off-distribution). On the
# fixture this sits near the 90th percentile, so the gate actually
# discriminates.
NLL_MAX = 3.41

# Recipe-pinned entropy-evenness floor for the composed keep decision
# (r10, VERDICT r9 item 3): keep requires
# entropy_bits >= ENTROPY_EVENNESS_MIN * log2(n_tokens) once a doc has
# ENTROPY_MIN_TOKENS+ tokens. The floor is RELATIVE by necessity: the
# Gopher token-fraction rules already imply an ABSOLUTE entropy floor
# of ~(1.2 + 0.3*log2 n) bits for any doc they pass (dup-token <= 0.70
# forces >= 0.3n distinct types; top-token <= 0.30 caps the mass of
# each), so a fixed-bits gate would be dead weight. What they do NOT
# bound is entropy relative to length: a doc of 3 stuffed keywords at
# ~23% mass each padded with 30% singletons and SHUFFLED (to evade the
# positional top-bigram rule) passes all three ratios with evenness
# ~= 0.3 + 1.47/log2(n) — under 0.50 by n ~= 200 — while every
# fixture doc sits above 0.60. 0.55 splits those populations; docs
# shorter than ENTROPY_MIN_TOKENS pass trivially (entropy is not
# meaningful there and the quality gate owns short-doc hygiene).
# tests/test_keep_decision_gates.py constructs the adversarial doc and
# pins that this gate — and none of the other four — rejects it.
ENTROPY_EVENNESS_MIN = 0.55
ENTROPY_MIN_TOKENS = 20


def corpus_keep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed per-document governance decision — the single
    boolean a training-data pipeline ultimately materializes: keep a
    TRAINING doc (benchmark-residue docs are the eval set, out of
    scope) iff it passes the quality score, is not repetitive
    (positionally OR distributionally — the entropy gate covers
    shuffled repetition the n-gram rules can't see), scores inside
    the LM band, and does not overlap the benchmark. Each gate is the
    SAME expression/operator its standalone query uses, so this also
    pins the governance tier's composability — and the oracle nests
    the committed oracles of the parts as CTEs, so it cannot drift
    from them.

    Plan shape (r14 optimization, guide §2.4 "remove shuffles
    outright"): the quality, repetition and entropy gates are all
    per-row functions of the SAME token array, so they fuse into one
    expression-only projection chain over one corpus scan — the old
    shape computed each gate as its standalone query (re-scanning and
    re-tokenizing the corpus per gate) and sort-merge-joined four
    one-row-per-doc frames on doc_id. The entropy gate folds the same
    per-distinct-token counts the repetition gate already computes
    (same rounded terms as ``text_entropy``'s per-(doc,tok) aggregate;
    the 6dp round on the sum absorbs fold-order float noise exactly as
    the cross-engine oracle compare always has). Only the corpus-level
    legs remain relational: the unigram-LM leg (vocab over ALL docs —
    bench docs included, exactly as ``text_logprob`` — then one
    tokens⋈vocab join + per-doc aggregate restricted to the training
    slice the output carries) and the contamination drop set
    (aggregated, broadcast). Gate values are bit-identical to the
    standalone queries'; the unchanged nested-CTE oracle pins it."""
    from ..text import dedup as _dedup

    is_bench = (
        F.col("doc_id") % _dedup.CONTAM_BENCH_MOD
        == _dedup.CONTAM_BENCH_RESIDUE
    )
    d_all = load_table(spark, sf_dir, "documents", spread=True)
    d = d_all.where(~is_bench)
    q = _quality(F.col("text"))
    staged = d.select(
        "doc_id",
        F.coalesce(
            q["quality"] >= QUALITY_THRESHOLD, F.lit(False)
        ).alias("quality_ok"),
        _tokens(F.col("text")).alias("toks"),
    )
    # Per-token/bigram frequency counts via RUN LENGTHS over the
    # SORTED arrays — O(n log n) per doc. The filter-count form
    # (`transform(array_distinct(xs), t -> size(filter(xs, ...)))`)
    # is O(distinct × len) per doc: quadratic for mostly-distinct
    # text, and it measurably dominated this query's wall time (the
    # shuffle savings of the gate fusion were being eaten by per-row
    # CPU). A boundary is a position whose successor differs (the
    # last position always bounds); tf values are consecutive-
    # boundary diffs. try_element_at + coalesce instead of relying
    # on OR short-circuit at i = size under ANSI.
    def _bounds(col: str) -> str:
        return (
            f"CASE WHEN size({col}) >= 1 THEN "
            f"filter(sequence(1, size({col})), i -> "
            f"coalesce(element_at({col}, i) <> try_element_at({col}, i + 1), "
            f"true)) ELSE CAST(array() AS array<int>) END"
        )

    def _run_lengths(col: str) -> str:
        return (
            f"CASE WHEN size({col}) >= 1 THEN "
            f"transform(sequence(1, size({col})), j -> "
            f"element_at({col}, j) - if(j = 1, 0, element_at({col}, j - 1))) "
            f"ELSE CAST(array() AS array<int>) END"
        )

    # sorted arrays hoisted into their own projection so the sort runs
    # once per row (multi-use non-cheap expr survives CollapseProject)
    staged = staged.select(
        "doc_id",
        "quality_ok",
        F.size("toks").cast("long").alias("n_tokens"),
        F.expr("array_sort(toks)").alias("stoks"),
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN "
            "array_sort(transform(sequence(1, size(toks) - 1), "
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"
            " ELSE CAST(array() AS array<string>) END"
        ).alias("sbigs"),
    )
    staged = staged.select(
        "doc_id",
        "quality_ok",
        "n_tokens",
        F.expr(_bounds("stoks")).alias("tbounds"),
        F.size("sbigs").cast("long").alias("n_bigrams"),
        F.expr(_bounds("sbigs")).alias("bbounds"),
    )
    staged = staged.select(
        "doc_id",
        "quality_ok",
        "n_tokens",
        F.size("tbounds").cast("long").alias("n_distinct"),
        F.expr(_run_lengths("tbounds")).alias("tfs"),
        "n_bigrams",
        F.expr(_run_lengths("bbounds")).alias("bfs"),
    )
    staged = staged.select(
        "doc_id",
        "quality_ok",
        "n_tokens",
        "n_distinct",
        F.expr("array_max(tfs)").cast("long").alias("top_token_cnt"),
        "n_bigrams",
        F.expr("array_max(bfs)").cast("long").alias("top_bigram_cnt"),
        # text_entropy's per-(doc,tok) terms as an array fold: tf/n
        # over the doc's own distribution, each term 6dp-rounded
        # before the sum, the sum 6dp-rounded and abs'd — identical
        # values to the aggregate form (the sum order differs from the
        # hash-aggregate's, which was itself nondeterministic; the 6dp
        # round on the sum absorbs fold-order float noise exactly as
        # the cross-engine oracle compare always has)
        F.expr(
            "abs(round(aggregate(transform(tfs, "
            "tf -> round(-(tf / cast(n_tokens as double)) "
            "* log2(tf / cast(n_tokens as double)), 6)), "
            "cast(0 as double), (a, x) -> a + x), 6))"
        ).alias("entropy_bits"),
    )
    repetitive = F.coalesce(
        (
            F.round(
                F.try_divide(
                    F.col("n_tokens") - F.col("n_distinct"), F.col("n_tokens")
                ),
                6,
            )
            > REPETITION_DUP_TOKEN_MAX
        )
        | (
            F.round(F.try_divide("top_token_cnt", "n_tokens"), 6)
            > REPETITION_TOP_TOKEN_MAX
        )
        | (
            F.round(F.try_divide("top_bigram_cnt", "n_bigrams"), 6)
            > REPETITION_TOP_BIGRAM_MAX
        ),
        F.lit(False),
    )
    entropy_ok = F.coalesce(
        (F.col("n_tokens") < ENTROPY_MIN_TOKENS)
        | (
            F.col("entropy_bits")
            >= ENTROPY_EVENNESS_MIN * F.log2("n_tokens")
        ),
        # NULL text: no tokens to assess (the doc is absent from the
        # exploded entropy frame in BOTH engines) — ok, exactly the
        # old left-join + coalesce-to-True
        F.lit(True),
    )
    gates = staged.select(
        "doc_id",
        "quality_ok",
        (~repetitive).alias("repetition_ok"),
        entropy_ok.alias("entropy_ok"),
    )
    # unigram-LM leg: vocab over ALL docs (text_logprob's corpus model,
    # bench docs included), scoring restricted to the training slice
    toks_all = d_all.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    vocab = toks_all.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tot = vocab.agg(
        F.sum("tf").cast("long").alias("n_corpus"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    scored_vocab = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.round(
            -F.log((F.col("tf") + 1) / (F.col("n_corpus") + F.col("n_vocab"))),
            6,
        ).alias("nll"),
    )
    nll = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
        # explicit broadcast (DSIR precedent): the vocab is
        # dictionary-sized but aggregate-built, so its size estimate
        # is unreliable — a silent SMJ would shuffle the exploded
        # token stream by tok.
        .join(F.broadcast(scored_vocab), "tok")
        .groupBy("doc_id")
        .agg(F.round(F.avg("nll"), 6).alias("mean_nll"))
        .select(
            "doc_id",
            F.coalesce(F.col("mean_nll") <= NLL_MAX, F.lit(False)).alias(
                "nll_ok"
            ),
        )
    )
    contam = (
        contamination_check_import(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    out = (
        gates.join(nll, "doc_id", "left")
        .join(F.broadcast(contam), "doc_id", "left")
        .select(
            "doc_id",
            "quality_ok",
            "repetition_ok",
            F.coalesce("nll_ok", F.lit(False)).alias("nll_ok"),
            "entropy_ok",
            (~F.coalesce("hit", F.lit(False))).alias("decontam_ok"),
        )
    )
    return out.withColumn(
        "keep",
        F.col("quality_ok") & F.col("repetition_ok") & F.col("nll_ok")
        & F.col("entropy_ok") & F.col("decontam_ok"),
    )


def contamination_check_import(spark: SparkSession, sf_dir: str):
    from ..text.dedup import contamination_check

    return contamination_check(spark, sf_dir)


QUERIES["corpus_keep_decision"] = corpus_keep_decision

# Oracle for the composed decision: the parts' committed oracles nest
# as CTE subqueries (the ann_recall_eval precedent), so this oracle is
# definitionally in sync with what it composes. No import cycle:
# dedup.py never imports analysis.
def _keep_decision_oracle() -> str:
    from .dedup import CONTAM_BENCH_MOD, CONTAM_BENCH_RESIDUE
    from .dedup import ORACLES as _DEDUP_ORACLES

    return f"""
WITH rep AS (
  SELECT doc_id, repetitive FROM ({ORACLES["text_repetition"]})
),
nll AS (
  SELECT doc_id, mean_nll FROM ({ORACLES["text_logprob"]})
),
ent AS (
  SELECT doc_id, n_tokens, entropy_bits FROM ({ENTROPY_ORACLE})
),
contam AS (
  SELECT DISTINCT doc_id FROM ({_DEDUP_ORACLES["contamination_check"]})
),
q AS (
  SELECT doc_id, {_QUALITY_SQL} AS quality
  FROM ({_QPARTS_SQL})
  WHERE doc_id % {CONTAM_BENCH_MOD} <> {CONTAM_BENCH_RESIDUE}
),
flags AS (
  SELECT q.doc_id,
         COALESCE(q.quality >= {QUALITY_THRESHOLD}, false) AS quality_ok,
         NOT r.repetitive AS repetition_ok,
         COALESCE(n.mean_nll <= {NLL_MAX}, false) AS nll_ok,
         COALESCE(e.n_tokens < {ENTROPY_MIN_TOKENS}
                  OR e.entropy_bits
                     >= {ENTROPY_EVENNESS_MIN} * log2(e.n_tokens),
                  true) AS entropy_ok,
         c.doc_id IS NULL AS decontam_ok
  FROM q
  JOIN rep r USING (doc_id)
  LEFT JOIN nll n USING (doc_id)
  LEFT JOIN ent e USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
)
SELECT doc_id, quality_ok, repetition_ok, nll_ok, entropy_ok,
       decontam_ok,
       (quality_ok AND repetition_ok AND nll_ok AND entropy_ok
        AND decontam_ok) AS keep
FROM flags
"""


# (ORACLES["corpus_keep_decision"] is assigned below ENTROPY_ORACLE —
# the composed oracle nests the entropy part's committed SQL.)


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution entropy + type-token ratio — the quality signal repetition rules can't see.

    Shannon entropy of the doc's own token distribution
    (-sum p log2 p, p = tf/n) is the classic gibberish/boilerplate
    axis: near-zero for a page that repeats one token (however the
    repeats are arranged — ``text_repetition``'s positional n-gram
    rules miss shuffled repetition), maximal for all-distinct text;
    the type-token ratio (distinct/total) is its bounded companion.
    Both feed keep/thin/drop curation next to the quality score and
    ``text_logprob`` (which scores against the CORPUS model — entropy
    is corpus-free, so the two disagree exactly on documents that are
    internally diverse but globally atypical, which is why both
    exist).

    Plan shape: explode tokens → ONE (doc, token) hash aggregate →
    one per-doc aggregate. Per-token entropy terms are 6dp-rounded
    before the per-doc sum (the ``text_logprob`` float discipline:
    order-stable folds across engines)."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    toks = d.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id")
    per_tok = tf.withColumn("n", F.sum("tf").over(wd)).select(
        "doc_id",
        "n",
        F.round(
            -(F.col("tf") / F.col("n"))
            * F.log2(F.col("tf") / F.col("n")),
            6,
        ).alias("term"),
    )
    return per_tok.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.round(
            F.count(F.lit(1)) / F.max("n").cast("double"), 6
        ).alias("ttr"),
        # abs: a single-distinct-token doc's one term is IEEE -0.0,
        # whose %.9g canonical form ('-0') differs from '0' — entropy
        # is >= 0 by definition, so normalize the sign in BOTH engines
        F.abs(F.round(F.sum("term"), 6)).alias("entropy_bits"),
    )


ENTROPY_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
),
per_tok AS (
  SELECT doc_id, sum(tf) OVER (PARTITION BY doc_id) AS n, tf
  FROM tf
),
terms AS (
  SELECT doc_id, n,
         round(-(tf / CAST(n AS DOUBLE))
               * log2(tf / CAST(n AS DOUBLE)), 6) AS term
  FROM per_tok
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS distinct_tokens,
       round(count(*) / CAST(max(n) AS DOUBLE), 6) AS ttr,
       abs(round(sum(term), 6)) AS entropy_bits
FROM terms GROUP BY doc_id
"""

ORACLES["corpus_keep_decision"] = _keep_decision_oracle()

# Staged (r9): the analysis module's registered QUERIES sit inside
# the 100-entry registry ceiling, so additions land in the staged
# split (the vocab/dedup/sketches precedent).

MIX_TEMP_ALPHA = 0.3  # the mT5/XLM-R multilingual sampling exponent


def corpus_mix_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-resampling mix plan (q_d ∝ p_d^α, the mT5/XLM-R recipe).

    ``corpus_mix``'s data-derived sibling: instead of hand-set target
    shares, the target IS the observed distribution flattened by an
    exponent,
    q_d ∝ p_d^α (α = 0.3, the mT5 / XLM-R recipe) — the standard way
    multilingual pretraining keeps head domains from drowning tail
    ones without inventing per-domain constants. Per domain: observed
    share, temperature share, the resulting boost factor
    (q_d / p_d — >1 means upsample, i.e. repeat epochs), and the
    sampled row budget at constant corpus size.

    Cross-engine float discipline: shares are exact integer ratios;
    the only transcendental (p^α) is rounded to 6dp per domain BEFORE
    normalizing (the text_logprob rule), and every published ratio is
    6dp-rounded from identically-structured expressions in both
    engines.

    Scale shape: ONE column-pruned count aggregate (a handful of
    rows), then window math over that tiny frame — the corpus_mix
    global-window precedent; nothing data-sized shuffles."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", spread=True).select(
        "lang"
    )
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy()
    t = stats.withColumn(
        "corpus_n", F.sum("n_docs").over(w)
    ).withColumn(
        "sh", F.col("n_docs") / F.col("corpus_n")
    ).withColumn(
        "p6",
        F.round(F.pow(F.col("sh"), F.lit(MIX_TEMP_ALPHA)), 6),
    )
    t = t.withColumn("tsum", F.sum("p6").over(w)).withColumn(
        "ts_raw", F.col("p6") / F.col("tsum")
    )
    return t.select(
        "lang",
        "n_docs",
        F.round("sh", 6).alias("share"),
        F.round("ts_raw", 6).alias("temp_share"),
        F.round(F.col("ts_raw") / F.col("sh"), 6).alias("boost"),
        F.round(F.col("ts_raw") * F.col("corpus_n"), 0)
        .cast("long")
        .alias("n_sampled"),
    )


MIX_TEMP_ORACLE = f"""
WITH s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
),
t AS (
  SELECT lang, n_docs,
         CAST(sum(n_docs) OVER () AS DOUBLE) AS corpus_n,
         n_docs / CAST(sum(n_docs) OVER () AS DOUBLE) AS sh
  FROM s
),
t2 AS (
  SELECT *, round(pow(sh, {MIX_TEMP_ALPHA!r}), 6) AS p6 FROM t
),
t3 AS (
  SELECT *, p6 / sum(p6) OVER () AS ts_raw FROM t2
)
SELECT lang, n_docs,
       round(sh, 6) AS share,
       round(ts_raw, 6) AS temp_share,
       round(ts_raw / sh, 6) AS boost,
       CAST(round(ts_raw * corpus_n, 0) AS BIGINT) AS n_sampled
FROM t3
"""


DOREMI_ETA = 1.0      # exponentiated-gradient step (DoReMi's default)
DOREMI_SMOOTH = 0.01  # uniform smoothing mass mixed into the update


def corpus_mix_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step from measured domain losses (Xie et al. 2023).

    ``corpus_mix_temperature`` flattens the observed shares with a
    fixed exponent; DoReMi instead moves the mix TOWARD the domains
    the model finds hard — exponentiated-gradient on excess loss:
    w_d ∝ p_d · exp(η · (loss_d − corpus_loss)), then mixed with the
    uniform distribution (smoothing mass c) so no domain's weight
    collapses. The loss here is the engine's own order-aware LM
    signal — per-domain mean of ``text_logprob_bigram``'s per-doc
    mean NLL — so the op composes two registered surfaces the way the
    published recipe composes a proxy model's loss with a sampler.
    Domains whose text surprises the reference LM get upsampled;
    domains it finds easy get downsampled. One step (the paper
    iterates; each iteration is this op re-run against refreshed
    losses).

    Cross-engine float discipline (the bigram-LM rules): per-doc
    mean_nll is already 6dp; per-domain and corpus sums are ROUNDED
    BEFORE their divides; the one transcendental (exp) is rounded to
    6dp per domain BEFORE normalizing (the MIX_TEMP rule); boost and
    the sampled budget derive from the same unrounded weight
    expression in both engines. A domain with no scorable docs
    (every doc < 2 tokens) takes excess 0 — pure share weight.

    Scale shape: the bigram scorer's own plan (dictionary-sized
    models, one tokenized scan) + ONE doc-keyed equi-join to carry
    lang + a domain-count aggregate; the EG math is window algebra
    over the handful-of-domains frame (the corpus_mix precedent).

    Columns: lang, n_docs, share, mean_loss, weight, boost,
    n_sampled."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "lang"
    )
    scores = text_logprob_bigram(spark, sf_dir).select(
        "doc_id", "mean_nll"
    )
    stats = (
        d.join(scores, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("mean_nll").cast("long").alias("n_scored"),
            F.round(F.sum("mean_nll"), 6).alias("sum_nll"),
        )
    )
    w = Window.partitionBy()
    t = (
        stats.withColumn(
            "corpus_n", F.sum("n_docs").over(w).cast("double")
        )
        .withColumn("sh", F.col("n_docs") / F.col("corpus_n"))
        .withColumn(
            "loss",
            F.when(
                F.col("n_scored") > 0,
                F.round(F.col("sum_nll") / F.col("n_scored"), 6),
            ),
        )
        .withColumn(
            "corpus_loss",
            F.round(
                F.round(F.sum("sum_nll").over(w), 6)
                / F.sum("n_scored").over(w),
                6,
            ),
        )
        .withColumn("n_langs", F.count(F.lit(1)).over(w).cast("double"))
    )
    # e6 floored at the 6dp grid's own resolution (ADVICE r13, the
    # P_FLOOR discipline): a tiny-share domain with strongly negative
    # excess loss can round to 0.0 — if EVERY domain did, w_norm's
    # divide would go 0/0 → NULL in both engines and the mix would
    # silently collapse; the floor keeps the smoothed weights a
    # distribution under any skew.
    t = t.withColumn(
        "e6",
        F.greatest(
            F.round(
                F.col("sh")
                * F.exp(
                    F.lit(DOREMI_ETA)
                    * F.coalesce(
                        F.col("loss") - F.col("corpus_loss"), F.lit(0.0)
                    )
                ),
                6,
            ),
            F.lit(1e-6),
        ),
    )
    t = t.withColumn("w_norm", F.col("e6") / F.sum("e6").over(w))
    w_raw = (
        F.lit(1.0 - DOREMI_SMOOTH) * F.col("w_norm")
        + F.lit(DOREMI_SMOOTH) / F.col("n_langs")
    )
    return t.select(
        "lang",
        "n_docs",
        F.round("sh", 6).alias("share"),
        F.col("loss").alias("mean_loss"),
        F.round(w_raw, 6).alias("weight"),
        F.round(w_raw / F.col("sh"), 6).alias("boost"),
        F.round(w_raw * F.col("corpus_n"), 0).cast("long").alias(
            "n_sampled"
        ),
    )


def _doremi_oracle() -> str:
    return f"""
WITH scores AS ({BIGRAM_ORACLE}),
per AS (
  SELECT d.lang, s.mean_nll
  FROM documents d JOIN scores s USING (doc_id)
),
stats AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(mean_nll) AS BIGINT) AS n_scored,
         round(sum(mean_nll), 6) AS sum_nll
  FROM per GROUP BY 1
),
t AS (
  SELECT *,
         CAST(sum(n_docs) OVER () AS DOUBLE) AS corpus_n,
         n_docs / CAST(sum(n_docs) OVER () AS DOUBLE) AS sh,
         CASE WHEN n_scored > 0
              THEN round(sum_nll / CAST(n_scored AS DOUBLE), 6) END
           AS loss,
         round(round(sum(sum_nll) OVER (), 6)
               / CAST(sum(n_scored) OVER () AS DOUBLE), 6)
           AS corpus_loss,
         CAST(count(*) OVER () AS DOUBLE) AS n_langs
  FROM stats
),
t2 AS (
  SELECT *,
         greatest(round(sh * exp({DOREMI_ETA!r}
                        * coalesce(loss - corpus_loss, 0.0)), 6),
                  1e-6) AS e6
  FROM t
),
t3 AS (
  SELECT *, e6 / sum(e6) OVER () AS w_norm FROM t2
)
SELECT lang, n_docs,
       round(sh, 6) AS share,
       loss AS mean_loss,
       round({1.0 - DOREMI_SMOOTH!r} * w_norm
             + {DOREMI_SMOOTH!r} / n_langs, 6) AS weight,
       round(({1.0 - DOREMI_SMOOTH!r} * w_norm
              + {DOREMI_SMOOTH!r} / n_langs) / sh, 6) AS boost,
       CAST(round(({1.0 - DOREMI_SMOOTH!r} * w_norm
                   + {DOREMI_SMOOTH!r} / n_langs) * corpus_n, 0)
            AS BIGINT) AS n_sampled
FROM t3
"""


SAMPLE_W_K = 100       # sample size (K ≪ corpus by design)
SAMPLE_W_SEED = "wsample|"
_U_HEX = 13            # 16^13 < 2^63: the md5-prefix unit uniform


def aes_logkey(doc_id_col, n_chars_col):
    """THE A-ES reservoir key, bound in one place: ln(u)/w with u the
    seeded md5-prefix unit uniform of doc_id and w = greatest(length,
    1), 12dp-rounded. Shared by the batch sampler below and the
    maintained reservoir (``streaming/sample.py``) so the two draws
    cannot drift — the key is a pure function of the row, which is
    what makes the reservoir mergeable and replay-idempotent."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(SAMPLE_W_SEED), doc_id_col.cast("string")
                )
            ),
            1,
            _U_HEX,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(16 ** _U_HEX) + 1.0)
    w = F.greatest(n_chars_col, F.lit(1)).cast("double")
    return F.round(F.log(u) / w, 12)


def corpus_sample_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (A-ES): top-K docs by ln(u)/w, w = doc length.

    The Efraimidis–Spirakis one-pass reservoir recipe: draw a uniform
    u per item, keep the K largest u^(1/w) — equivalently the K
    largest ln(u)/w — and the sample is a weight-proportional
    without-replacement draw. Weighting by ``n_chars`` makes doc
    inclusion ∝ length, i.e. an approximation of TOKEN-uniform
    sampling (the budget-fair way to subsample a corpus for eval or
    distillation); any non-negative weight column drops in.

    Determinism (the md5-prefix sampler discipline,
    ``corpus_sample_stratified``): u is the seeded md5 prefix of
    doc_id mapped into (0, 1] — reproducible across engines, retries
    and repartitions, and the DuckDB oracle rebuilds the identical
    draw. ln(u)/w is rounded to 12dp (coarser 6dp would tie most of
    the corpus: |ln u|/w ~ 1e-4 at fixture lengths) with (logkey,
    doc_id) as the total order, so the boundary is engine-stable.

    Scale shape: pure map to compute the key, then ``orderBy.limit``
    — Spark plans TakeOrderedAndProject: a per-partition K-heap and a
    driver merge of P·K rows, NO global sort, no corpus-wide single
    task. The final rank window runs over the K retained rows only
    (bounded by construction). Empty-text docs draw with weight
    ``greatest(n_chars, 1)`` (ANSI division guard)."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    from pyspark.sql import Window

    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        aes_logkey(F.col("doc_id"), F.col("n_chars")).alias("logkey"),
    )
    top = keyed.orderBy(
        F.col("logkey").desc(), F.col("doc_id").asc()
    ).limit(SAMPLE_W_K)
    w_rank = Window.orderBy(F.col("logkey").desc(), F.col("doc_id"))
    return top.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    )


SAMPLE_W_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         round(
           ln((CAST(('0x' || substring(md5('{SAMPLE_W_SEED}' ||
                     CAST(doc_id AS VARCHAR)), 1, {_U_HEX}))
                AS BIGINT) + 1)
              / (CAST(16 AS DOUBLE) ^ {_U_HEX} + 1))
           / CAST(greatest(n_chars, 1) AS DOUBLE),
           12) AS logkey
  FROM documents
)
SELECT doc_id, lang, n_chars, logkey,
       CAST(row_number() OVER (ORDER BY logkey DESC, doc_id)
            AS BIGINT) AS rank
FROM keyed
ORDER BY logkey DESC, doc_id
LIMIT {SAMPLE_W_K}
"""


BIGRAM_BACKOFF = 0.4   # stupid-backoff discount (Brants et al. 2007)


def text_logprob_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM scoring with stupid backoff — the word-order-aware quality signal.

    ``text_logprob`` scores docs under a unigram model (CCNet's
    perplexity-bucket axis); this is its order-aware sibling, the
    cheap count-based stand-in for a KenLM pass: each adjacent token
    pair scores S(w|v) = count(vw)/count(v) when the bigram was seen,
    else BACKOFF · p1(w) (stupid backoff, Brants et al. 2007), with
    p1 the same add-one unigram model ``text_logprob`` uses.
    Word-salad docs whose tokens are individually common but never
    co-occur score high here while staying invisible to the unigram
    signal — the second axis a perplexity-bucket keep/thin/drop rule
    wants.

    Spark shape: ONE tokenized scan feeds both models — the unigram
    hash aggregate and the bigram hash aggregate (adjacent pairs via
    a transform-over-slice expression, the DSIR ``_grams`` shape);
    the scoring pass joins each doc pair LEFT to the bigram table
    (miss → backoff) and to the unigram table on the current token.
    Both build sides are dictionary-sized (at web scale the bigram
    table takes a frequency cutoff — the text_logprob vocab rule).
    Per-pair nll rounds to 6dp before the mean (order-stable fold);
    p2 and p1 are exact integer ratios in both engines. Docs with
    < 2 tokens have no word-order evidence: they keep n_pairs = 0
    and a NULL mean via the doc-list left join (the unigram signal
    covers them).

    r13: the model build (``_bigram_lm``) and the scoring tail
    (``_score_pairs_against_lm``) are bound once and shared with the
    maintained LM store (``streaming/bigram.py``), which serves the
    same score from at-rest count partials without refitting; a
    token the model never saw takes the add-one unseen probability
    1/(n_corpus + n_vocab) — exactly the (tf=0)+1 row of the same
    smoothing, so the backoff is total over novel docs. Here the
    model is fit on the scored corpus itself, so the unseen branch
    never fires and results are bit-identical to the pre-r13 form."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    toks = d.select("doc_id", _tokens(F.col("text")).alias("t"))
    vocab, pairs, bigrams = _lm_counts(toks)
    lm = _bigram_lm(vocab, bigrams)
    return _score_pairs_against_lm(d.select("doc_id"), pairs, lm)


def _lm_counts(toks: DataFrame):
    """(vocab, pairs, bigrams) from a tokenized (doc_id, t) frame —
    the raw integer counts both the inline fit and the maintained
    store's epoch partials are built from."""
    uni = toks.select("doc_id", F.explode("t").alias("tok"))
    vocab = uni.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
                " (x, i) -> named_struct("
                "'v', x, 'w', element_at(t, i + 2)))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    bigrams = pairs.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_vw")
    )
    return vocab, pairs, bigrams


def _bigram_lm(vocab: DataFrame, bigrams: DataFrame) -> dict:
    """The stupid-backoff model frames from raw counts — ONE
    definition shared by the inline op (counts from its own scan) and
    the maintained LM store (counts summed from epoch partials), so
    the served model is BIT-equal whenever the integer counts are.
    ``floor`` is the one-row add-one unseen-token probability
    1/(n_corpus + n_vocab) — the same smoothing evaluated at tf=0,
    which makes scoring total over docs the fit never saw."""
    tot = vocab.agg(
        F.sum("tf").cast("long").alias("n_corpus"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    p1 = vocab.crossJoin(F.broadcast(tot)).select(
        F.col("tok").alias("w"),
        (
            (F.col("tf") + 1) / (F.col("n_corpus") + F.col("n_vocab"))
        ).alias("p1"),
    )
    model = bigrams.join(
        vocab.select(F.col("tok").alias("v"), F.col("tf").alias("n_v")),
        "v",
    ).select("v", "w", (F.col("n_vw") / F.col("n_v")).alias("p2"))
    floor = tot.select(
        (F.lit(1.0) / (F.col("n_corpus") + F.col("n_vocab"))).alias(
            "p1_unseen"
        )
    )
    return {"p1": p1, "model": model, "floor": floor}


def _score_pairs_against_lm(
    doc_ids: DataFrame, pairs: DataFrame, lm: dict
) -> DataFrame:
    """The scoring tail over any (doc_id, v, w) pair frame and any
    ``_bigram_lm`` model — shared by the inline op and the store
    serve. Both model joins are LEFT (seen bigram → p2; unseen bigram
    seen token → backoff·p1; unseen token → backoff·add-one floor via
    the broadcast 1-row scalar), so no pair ever silently drops from
    the sum (the r13 session-anomaly discipline)."""
    # Explicit broadcast of both model sides (r14, the DSIR
    # precedent): the planner's size estimate for an aggregate-built
    # frame is unreliable, and a silent SMJ/SHJ here shuffles the
    # O(tokens) pair stream TWICE by model keys — the model and p1
    # are dictionary-sized by construction (at web scale the bigram
    # table takes a frequency cutoff, the text_logprob vocab rule),
    # so the pair stream should never cross an Exchange before its
    # per-doc aggregate.
    scored = (
        pairs.join(F.broadcast(lm["model"]), ["v", "w"], "left")
        .join(F.broadcast(lm["p1"]), "w", "left")
        .crossJoin(F.broadcast(lm["floor"]))
        .select(
            "doc_id",
            F.round(
                -F.log(
                    F.coalesce(
                        F.col("p2"),
                        F.lit(BIGRAM_BACKOFF)
                        * F.coalesce(F.col("p1"), F.col("p1_unseen")),
                    )
                ),
                6,
            ).alias("nll"),
        )
    )
    # round the SUM before dividing (not avg over raw items): the two
    # engines fold the 6dp items in different orders, and sum/n lands
    # systematically on 6dp half-boundaries (any n = 10·k doc), where
    # a 1-ulp sum difference flips the rounded mean. Rounding the sum
    # first snaps both engines to the same decimal — the division
    # then runs on identical doubles and rounds identically.
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.sum("nll"), 6).alias("sum_nll"),
    ).select(
        "doc_id",
        "n_pairs",
        F.round(F.col("sum_nll") / F.col("n_pairs"), 6).alias(
            "mean_nll"
        ),
    )
    return (
        doc_ids
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias(
                "n_pairs"
            ),
            "mean_nll",
        )
    )


BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
uni AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
),
vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM uni GROUP BY 1
),
tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS n_corpus,
         CAST(count(*) AS BIGINT) AS n_vocab
  FROM vocab
),
p1 AS (
  SELECT tok AS w, (tf + 1) / CAST(n_corpus + n_vocab AS DOUBLE) AS p1
  FROM vocab, tot
),
pairs AS (
  SELECT doc_id,
         unnest(t[1:len(t) - 1]) AS v,
         unnest(t[2:len(t)]) AS w
  FROM toks
),
bigrams AS (
  SELECT v, w, CAST(count(*) AS BIGINT) AS n_vw
  FROM pairs GROUP BY 1, 2
),
model AS (
  SELECT b.v, b.w, b.n_vw / CAST(u.tf AS DOUBLE) AS p2
  FROM bigrams b JOIN vocab u ON b.v = u.tok
),
scored AS (
  SELECT p.doc_id,
         round(-ln(coalesce(m.p2,
                            {BIGRAM_BACKOFF!r}
                            * coalesce(p1.p1,
                                       1.0 / (tot.n_corpus
                                              + tot.n_vocab)))), 6)
           AS nll
  FROM pairs p
  LEFT JOIN model m ON p.v = m.v AND p.w = m.w
  LEFT JOIN p1 ON p.w = p1.w
  CROSS JOIN tot
),
per_doc0 AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         round(sum(nll), 6) AS sum_nll
  FROM scored GROUP BY 1
),
per_doc AS (
  SELECT doc_id, n_pairs,
         round(sum_nll / n_pairs, 6) AS mean_nll
  FROM per_doc0
)
SELECT d.doc_id,
       CAST(coalesce(pd.n_pairs, 0) AS BIGINT) AS n_pairs,
       pd.mean_nll
FROM documents d LEFT JOIN per_doc pd USING (doc_id)
"""


STAGED_QUERIES = {
    "text_entropy": text_entropy,
    "corpus_mix_temperature": corpus_mix_temperature,
    # r13: loss-driven domain reweighting (one DoReMi EG step over
    # the bigram-LM signal).
    "corpus_mix_doremi": corpus_mix_doremi,
}
STAGED_ORACLES = {
    "text_entropy": ENTROPY_ORACLE,
    "corpus_mix_temperature": MIX_TEMP_ORACLE,
    "corpus_mix_doremi": _doremi_oracle(),
}

# r13 graduations (the ROADMAP r13 queue, staged green since r11):
# the word-order-aware LM scorer and the A-ES weighted
# without-replacement sampler take the registry slots freed by the
# text_repetition / text_logprob retirements (both retire into
# corpus_keep_decision, which executes their fns in its Spark plan
# and nests their committed SQL as CTEs — see registry.RETIRED;
# standalone driver-rigor parity stays pinned in
# tests/test_governance.py).
QUERIES["text_logprob_bigram"] = text_logprob_bigram
ORACLES["text_logprob_bigram"] = BIGRAM_ORACLE
QUERIES["corpus_sample_weighted"] = corpus_sample_weighted
ORACLES["corpus_sample_weighted"] = SAMPLE_W_ORACLE
