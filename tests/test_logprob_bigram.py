"""text_logprob_bigram (text/analysis.py, staged r11, graduated r13): stupid-backoff
bigram LM scoring — oracle parity plus the properties that make it
the word-order signal the unigram score cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.text import analysis

from .oracle_utils import assert_matches_oracle


def test_bigram_logprob_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        analysis.text_logprob_bigram(spark, sf_dir),
        analysis.ORACLES["text_logprob_bigram"],
        sf_dir,
    )


def test_word_salad_scores_worse_than_natural_order(spark):
    """The entire point: a doc whose tokens are corpus-common but in
    a never-seen order must score WORSE (higher mean nll) than docs
    using the corpus' own frequent bigrams — invisible to the unigram
    model, which sees identical token multisets."""
    base = "the cat sat on the mat"
    rows = [(i, base, "en", "x", len(base)) for i in range(20)]
    # same tokens, shuffled into bigrams the corpus never produces
    salad = "mat the on sat cat the"
    rows.append((100, salad, "en", "x", len(salad)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    # drive the plan via a temp view through the loader seam: easiest
    # is to call the internal plan on a constructed frame by writing
    # it where load_table reads — instead, score directly with the
    # same expressions through a small local pipeline.
    import tempfile

    d = tempfile.mkdtemp(prefix="bigram_docs_")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    # empty side tables are not needed: the op reads only documents
    out = {
        r.doc_id: r
        for r in analysis.text_logprob_bigram(spark, d).collect()
    }
    natural = [out[i].mean_nll for i in range(20)]
    assert out[100].mean_nll > max(natural), (out[100], max(natural))


def test_short_docs_carry_null_mean_and_zero_pairs(spark, sf_dir):
    out = analysis.text_logprob_bigram(spark, sf_dir)
    short = out.where(F.col("n_pairs") == 0).collect()
    for r in short:
        assert r.mean_nll is None
    scored = out.where(F.col("n_pairs") > 0)
    assert scored.where(F.col("mean_nll").isNull()).count() == 0
    assert scored.where(F.col("mean_nll") <= 0).count() == 0
