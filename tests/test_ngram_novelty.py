"""text_ngram_novelty (text/dedup.py, staged r12): the continuous
memorization-risk score — oracle parity plus hand-checked novelty on
a constructed corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.text import dedup

from .oracle_utils import assert_matches_oracle


def test_novelty_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        dedup.text_ngram_novelty(spark, sf_dir),
        dedup.STAGED_ORACLES["text_ngram_novelty"],
        sf_dir,
    )


def test_novelty_hand_check(spark, tmp_path):
    """Constructed corpus: doc 17 (residue 7) is the reference; doc 1
    copies it verbatim (novelty 0), doc 2 shares half its text, doc 3
    is disjoint (novelty 1), doc 4 is too short to gram (absent)."""
    ref = "the cat sat on the mat today"
    rows = [
        (17, ref),                                   # reference slice
        (1, ref),                                    # verbatim copy
        (2, "the cat sat under a very large tree"),  # partial overlap
        (3, "completely different words about query engines here"),
        (4, "hi you"),                               # < 3 tokens
    ]
    df = spark.createDataFrame(
        [(i, t, "en", f"s{i}", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    import os

    from customer_churn_prediction_spark.catalog import TABLES

    from .conftest import SF_SMOKE

    path = str(tmp_path)
    # the oracle harness registers every catalog table: symlink the
    # smoke fixtures for the ones this op never reads
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(path, f"{t}.parquet"))
    # the oracle view needs a FILE, not Spark's part-file directory
    import shutil

    staging = f"{path}/_staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    shutil.move(
        os.path.join(staging, part), f"{path}/documents.parquet"
    )
    shutil.rmtree(staging)
    out = {
        r.doc_id: r
        for r in dedup.text_ngram_novelty(spark, path).collect()
    }
    assert set(out) == {1, 2, 3}          # 17 is reference, 4 gramless
    assert out[1].novelty == 0.0
    assert out[3].novelty == 1.0
    # doc 2: 6 grams, only "the cat sat" shared -> 5/6 novel
    assert out[2].n_grams == 6 and out[2].n_novel == 5
    assert out[2].novelty == round(5 / 6, 6)

    # parity holds on the constructed corpus too (driver rigor)
    assert_matches_oracle(
        dedup.text_ngram_novelty(spark, path),
        dedup.STAGED_ORACLES["text_ngram_novelty"],
        path,
    )


def test_novelty_complements_contamination(spark, sf_dir):
    """Every doc the threshold check flags must sit in the LOW-novelty
    tail here (overlap >= threshold on some benchmark doc implies a
    materially non-novel gram set) — the two views cannot disagree
    about who overlaps."""
    flagged = {
        r.doc_id
        for r in dedup.contamination_check(spark, sf_dir).collect()
    }
    if not flagged:
        import pytest

        pytest.skip("fixture has no contaminated docs at sf")
    nov = {
        r.doc_id: r.novelty
        for r in dedup.text_ngram_novelty(spark, sf_dir).collect()
    }
    unflagged = [v for k, v in nov.items() if k not in flagged]
    for d in flagged:
        assert nov[d] < 1.0
        # flagged docs are more reference-like than the typical doc
        import statistics

        assert nov[d] <= statistics.median(unflagged)


def test_store_served_novelty_equals_inline(spark, sf_smoke, tmp_path):
    """The maintained benchmark-gram registry (streaming/novelty.py,
    r13): ingest the op's own reference slice (split across three
    micro-batches), then novelty_report against the maintained gram
    set must equal the inline text_ngram_novelty (which re-shingles
    the reference per call) row-for-row — and every n_unseen-free
    column matches because the two paths share score_novelty_against
    (one definition)."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import novelty as snov

    d = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 10 == 7)
    stream_dir = str(tmp_path / "arrivals")
    for i in range(3):
        bench.where(F.expr("doc_id div 10") % 3 == i).repartition(
            1
        ).write.mode("append").parquet(stream_dir)
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = snov.maintain_ref_grams(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    served = sorted(
        map(
            tuple,
            snov.novelty_report(
                spark, store, d.where(F.col("doc_id") % 10 != 7)
            ).collect(),
        )
    )
    inline = sorted(
        map(tuple, dedup.text_ngram_novelty(spark, sf_smoke).collect())
    )
    assert served == inline and served


def test_store_served_contamination_equals_inline(
    spark, sf_smoke, tmp_path
):
    """The registry's second consumer: contamination_report against
    the maintained gram set must equal the inline contamination_check
    (which re-shingles the benchmark per call) row-for-row — the two
    share score_contamination_against, and the per-benchmark gram
    counts recovered from the stored provenance pairs must equal the
    array_distinct sizes the inline op computes. An empty registry
    flags nothing."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import novelty as snov

    d = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    corpus = d.where(F.col("doc_id") % 10 != 7)
    store = str(tmp_path / "store")
    assert (
        snov.contamination_report(spark, store, corpus).collect() == []
    )

    bench = d.where(F.col("doc_id") % 10 == 7)
    stream_dir = str(tmp_path / "arrivals")
    bench.repartition(1).write.mode("append").parquet(stream_dir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = snov.maintain_ref_grams(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    served = sorted(
        map(
            tuple,
            snov.contamination_report(spark, store, corpus).collect(),
        )
    )
    inline = sorted(
        map(
            tuple,
            dedup.contamination_check(spark, sf_smoke).collect(),
        )
    )
    assert served == inline and served


def test_reregister_docs_latest_version_wins(spark, tmp_path):
    """ADVICE r13 #3: a benchmark doc re-delivered with REVISED text
    used to accumulate grams from BOTH versions (distinct union
    across epochs), inflating n_bench and deflating overlap_frac vs
    the inline op over current text. reregister_docs erases the old
    pairs in place and registers the current text — the registry's
    state equals a fresh registration of the revised corpus."""
    from customer_churn_prediction_spark.streaming import novelty as snov

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    v1 = mk([(1, "alpha beta gamma delta epsilon zeta eta theta"),
             (2, "one two three four five six seven eight nine")])
    store = str(tmp_path / "store")
    stream_dir = str(tmp_path / "arrivals")
    v1.repartition(1).write.mode("append").parquet(stream_dir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = snov.maintain_ref_grams(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    # doc 1's text is revised; doc 2 untouched
    v2_doc1 = mk([(1, "iota kappa lambda mu nu xi omicron pi rho")])
    snov.reregister_docs(spark, store, v2_doc1)

    got = sorted(
        map(tuple, snov.current_pairs(spark, store).collect())
    )
    # reference state: registering the revised corpus from scratch
    fresh = str(tmp_path / "fresh_store")
    want = sorted(
        map(
            tuple,
            snov._doc_grams(
                mk([(1, "iota kappa lambda mu nu xi omicron pi rho"),
                    (2, "one two three four five six seven eight nine")])
            ).collect(),
        )
    )
    assert got == want and got
    # n_bench recovered from provenance equals the revised doc's
    # distinct gram count — no inflation from the v1 grams
    probe = mk([(100, "iota kappa lambda mu nu xi omicron pi rho")])
    rep = {
        r.bench_id: r
        for r in snov.contamination_report(spark, store, probe).collect()
    }
    n_doc1_v2 = sum(1 for (_, d) in want if d == 1)
    # overlap_frac = n_shared / n_bench; the probe IS the revised
    # text, so n_shared equals the revised doc's distinct gram count
    # and a v1-inflated n_bench would drag overlap_frac below 1.0
    assert rep[1].n_shared == n_doc1_v2
    assert rep[1].overlap_frac == 1.0

    # re-registering into a never-ingested store is a first
    # registration (forget no-ops, base partition is created)
    empty_store = str(tmp_path / "empty_store")
    snov.reregister_docs(spark, empty_store, v2_doc1)
    got2 = sorted(
        map(tuple, snov.current_pairs(spark, empty_store).collect())
    )
    assert got2 == sorted((s, d) for (s, d) in want if d == 1)
