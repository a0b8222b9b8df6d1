"""vocab_bpe_merges (text/vocab.py) — staged registry candidate; oracle
parity at driver rigor plus reference-BPE semantics on constructed
corpora."""

from __future__ import annotations

from customer_churn_prediction_spark.text import vocab

from .oracle_utils import assert_matches_oracle


def test_bpe_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        vocab.bpe_merges(spark, sf_dir), vocab.VOCAB_ORACLE, sf_dir
    )


def _corpus(spark, sf_dir, tmp_path, texts):
    """Scratch sf-dir with a constructed documents table. Single-FILE
    parquets (copied originals + a pyarrow-written documents.parquet)
    so the DuckDB oracle can read them exactly like the fixtures —
    Spark-written directory parquets would need a glob."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    src = str(tmp_path / "bpe_corpus")
    os.makedirs(src, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{src}/{t}.parquet")
    pa_pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{src}/documents.parquet",
    )
    return src


def test_greedy_left_merge_on_runs(spark, sf_dir, tmp_path):
    """Reference-BPE semantics: in 'aaa' the pair (a,a) merges its
    FIRST occurrence only (non-overlapping left-to-right), leaving
    'aa'+'a'; the round-2 argmax then tie-breaks lexicographically."""
    src = _corpus(spark, sf_dir, tmp_path, ["aaa"] * 5)
    rows = {r.rnd: r for r in vocab.bpe_merges(spark, src, 3).collect()}
    # round 1: (a, a) appears twice per word x 5 docs = 10
    assert (rows[1].left, rows[1].right, rows[1].pair_count) == ("a", "a", 10)
    # after merging: ' aa a EOW ' -> pairs (aa,a)=5 and (a,EOW)=5;
    # tie-break on left asc: 'a' < 'aa'
    assert (rows[2].left, rows[2].right, rows[2].pair_count) == (
        "a", "EOW", 5,
    )
    # then ' aa aEOW ' -> (aa, aEOW) = 5
    assert (rows[3].left, rows[3].right, rows[3].pair_count) == (
        "aa", "aEOW", 5,
    )


def test_fully_merged_word_stops_contributing_pairs(spark, sf_dir,
                                                    tmp_path):
    """A word whose whole symbol string collapses into ONE merge token
    must simply stop contributing pairs (like the oracle's empty
    generate_series), not crash: unguarded, sequence(1, size-1)
    DESCENDS at size 1 and element_at(syms, 2) throws
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT. 'a a a ...' merges (a, EOW)
    in round 1, making every 'a' word the single symbol 'aEOW'."""
    src = _corpus(spark, sf_dir, tmp_path, ["a a a a a"] * 3)
    rows = vocab.bpe_merges(spark, src, 4).collect()
    assert (rows[0].left, rows[0].right) == ("a", "EOW")
    # Round 2 finds no remaining adjacent pair anywhere -> fit stops
    # early with just the one merge instead of raising.
    assert len(rows) == 1


def test_merges_weighted_by_word_frequency(spark, sf_dir, tmp_path):
    """BPE trains on the word-frequency table: a rare long word must
    lose to a frequent short one."""
    src = _corpus(
        spark, sf_dir, tmp_path, ["to to to to", "xylophones"]
    )
    first = vocab.bpe_merges(spark, src, 1).collect()[0]
    # 'to' (freq 4) contributes (t,o)=4 and (o,EOW)=4; every pair of
    # the rare 'xylophones' counts 1. The tie resolves lexicographically
    # ('o' < 't'), so the winner is (o, EOW) — what matters is that its
    # count is the frequent word's 4, not the rare word's 1.
    assert (first.left, first.right) == ("o", "EOW")
    assert first.pair_count == 4


def test_corpus_is_scanned_once(spark, sf_dir):
    plan = (
        vocab.word_freq_table(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet ") == 1
    assert "HashAggregate" in plan


def test_tokenize_bpe_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        vocab.tokenize_bpe(spark, sf_dir), vocab.TOKENIZE_ORACLE, sf_dir
    )


def test_tokenize_counts_shrink_with_merges(spark, sf_dir):
    """Applying merges can only reduce (or keep) the per-doc token
    count vs raw character+EOW symbols, and total tokens must drop by
    at least the top merge's corpus count."""
    raw = {
        r.doc_id: r.n_tokens_bpe
        for r in vocab.tokenize_bpe(spark, sf_dir, n_merges=0).collect()
    }
    merged = {
        r.doc_id: r.n_tokens_bpe
        for r in vocab.tokenize_bpe(spark, sf_dir).collect()
    }
    assert set(raw) == set(merged)
    assert all(merged[d] <= raw[d] for d in raw)
    top = vocab.bpe_merges(spark, sf_dir, 1).collect()[0]
    assert sum(raw.values()) - sum(merged.values()) >= top.pair_count


def test_tokenize_is_a_pure_map(spark, sf_dir):
    """With the merge table as literals, encoding must plan as a map
    over the scan: no join, no aggregate, no shuffle beyond the
    catalog's spread repartition."""
    df = vocab.tokenize_bpe(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in ("HashAggregate", "SortMergeJoin", "BroadcastHashJoin",
               "Window"):
        assert op not in plan, op


def test_regex_metachar_symbols_are_literal(spark, sf_dir, tmp_path):
    """Learned symbols are corpus text: a corpus whose characters are
    regex metacharacters must train and encode via LITERAL replace —
    full oracle parity on both the merge table and the token counts
    (a regex-interpreted '.' pattern would rewrite unrelated pairs
    and break both)."""
    src = _corpus(spark, sf_dir, tmp_path, ["a.b a.b x.y", "($) ($)"])
    assert_matches_oracle(vocab.bpe_merges(spark, src, 3),
                          vocab._vocab_oracle(3), src)
    assert_matches_oracle(vocab.tokenize_bpe(spark, src, 3),
                          vocab._tokenize_oracle(3), src)
    top = vocab.bpe_merges(spark, src, 1).collect()[0]
    # (., b)? ('a','.')? whatever wins, it must involve a metachar and
    # the literal count of that adjacent pair:
    assert any(c in ".$()" for c in top.left + top.right)


def test_run_semantics_are_the_documented_variant(spark, sf_dir, tmp_path):
    """'abab' documents the divergence from sequential reference BPE:
    the round's replace merges the FIRST 'a b' only (the shared
    boundary space is consumed); the second occurrence merges next
    round while the pair stays on top."""
    src = _corpus(spark, sf_dir, tmp_path, ["abab abab"])
    rows = {r.rnd: r for r in vocab.bpe_merges(spark, src, 2).collect()}
    assert (rows[1].left, rows[1].right) == ("a", "b")
    assert rows[1].pair_count == 4  # 2 occurrences x 2 words
    # round 2: the skipped second occurrence still exists -> (a, b)
    # remains the top pair and completes (reference BPE would have
    # merged both in round 1)
    assert (rows[2].left, rows[2].right) == ("a", "b")
    assert rows[2].pair_count == 2


def test_vocab_eval_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        vocab.vocab_eval_compression(spark, sf_dir),
        vocab.ORACLES["vocab_eval_compression"],
        sf_dir,
    )


def test_vocab_eval_single_token_coverage(spark, sf_dir, tmp_path):
    """A word the vocabulary fully merges must count as single-token
    coverage: with one merge on ['a a a a', 'bc bc'] the winner is
    (a, EOW) (freq 4), so every 'a' occurrence encodes to ONE token
    while 'bc' stays 3 ('b c EOW') — frac 4/6. Full oracle parity on
    the constructed corpus too (driver rigor)."""
    src = _corpus(spark, sf_dir, tmp_path, ["a a a a", "bc bc"])
    assert_matches_oracle(
        vocab.vocab_eval_compression(spark, src, 1),
        vocab._vocab_eval_oracle(1),
        src,
    )
    row = vocab.vocab_eval_compression(spark, src, 1).collect()[0]
    assert row.n_words == 6
    assert row.n_single_token_words == 4
    assert row.single_token_frac == 0.666667
    assert row.n_tokens_bpe == 4 * 1 + 2 * 3


def test_vocab_eval_encode_chain_materializes_once(spark, sf_dir):
    """The toks array is a multi-use non-cheap projection (token sum +
    single-token filter): CollapseProject must keep it materialized so
    the K-replace encode chain runs ONCE per word (SCALE §4.1), and
    the wordless-doc predicate must be the cheap scan-level rlike, not
    a pushed-down copy of the split pipeline."""
    df = vocab.vocab_eval_compression(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # 6 literal replaces + the one regexp_replace symbol spacer
    assert opt.count("replace(") == vocab.N_MERGES + 1, opt
    assert "RLIKE" in opt
