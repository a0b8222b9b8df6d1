"""Chunking + packing invariants (the context-window splitting and
concatenate-and-split packing ops a training dataloader feeds from)."""

from pyspark.sql import functions as F

from customer_churn_prediction_spark.text import analysis


def test_chunks_reassemble_to_tokenized_doc(spark, sf_dir):
    """Chunks in chunk_id order rejoin to exactly the whitespace
    tokenization of the source doc, every chunk is within budget, and
    only the LAST chunk may be short."""
    chunks = analysis.text_chunks(spark, sf_dir)
    c = analysis.CHUNK_TOKENS
    rejoined = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rejoined"),
            F.max("n_tokens").alias("max_chunk"),
            F.min("n_tokens").alias("min_chunk"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tok_sum"),
        )
    )
    docs = (
        analysis.load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.array_join(
                analysis._tokens(F.col("text")), " "
            ).alias("want"),
            F.size(analysis._tokens(F.col("text"))).cast("long").alias("n"),
        )
    )
    joined = rejoined.join(docs, "doc_id")
    assert joined.count() == docs.count()
    bad = joined.where(
        (F.col("rejoined") != F.col("want"))
        | (F.col("max_chunk") > c)
        | (F.col("tok_sum") != F.col("n"))
        | (F.col("n_chunks") != F.ceil(F.col("n") / c))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_pack_conserves_tokens_and_bounds_bins(spark, sf_dir):
    """Packing is a partition of each source shard's token stream:
    per-source bin_tokens sum to the shard total, every bin is
    non-empty, bin 0 exists, and no bin id exceeds the stream's last
    budget boundary. (Bin ids may legitimately skip when one doc
    spans multiple budgets — the start-bin accounting convention —
    so density is bounded, not exact.)"""
    b = analysis.PACK_BUDGET
    packed = analysis.corpus_pack(spark, sf_dir).cache()
    try:
        assert packed.where(
            (F.col("n_docs") <= 0) | (F.col("bin_tokens") <= 0)
        ).count() == 0
        per_source = packed.groupBy("source").agg(
            F.sum("bin_tokens").alias("packed_tokens"),
            F.sum("n_docs").alias("packed_docs"),
            F.min("bin_id").alias("min_bin"),
            F.max("bin_id").alias("max_bin"),
        )
        totals = (
            analysis.load_table(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .groupBy("source")
            .agg(
                F.sum(
                    F.size(analysis._tokens(F.col("text"))).cast("long")
                ).alias("want_tokens"),
                F.count(F.lit(1)).alias("want_docs"),
            )
        )
        j = per_source.join(totals, "source")
        bad = j.where(
            (F.col("packed_tokens") != F.col("want_tokens"))
            | (F.col("packed_docs") != F.col("want_docs"))
            | (F.col("min_bin") != 0)
            | (F.col("max_bin") > F.floor((F.col("want_tokens") - 1) / b))
        )
        assert bad.count() == 0, bad.collect()
    finally:
        packed.unpersist()


def test_redact_scrubs_injected_pii(spark):
    """The corpus fixture is PII-free (counts 0 there is the honest
    oracle result), so redaction needs a signal-bearing check: inject
    each pattern kind and assert the span is replaced and counted.
    Runs the same expressions as the registry query on a local frame."""
    from pyspark.sql import functions as F

    rows = [
        (1, "contact me at jane.doe+x@example.co.uk for details"),
        (2, "call +1 (555) 123-4567 tomorrow"),
        (3, "card 4111111111111111 was used"),
        (4, "clean text with no identifiers"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    redacted = F.col("text")
    counts = []
    for kind, pat in analysis._PII_PATTERNS:
        counts.append(
            F.regexp_count("text", F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind}>")
    out = {
        r.doc_id: r
        for r in d.select(
            "doc_id", redacted.alias("redacted_text"), *counts
        ).collect()
    }
    assert out[1].n_email == 1 and "<email>" in out[1].redacted_text
    assert "jane" not in out[1].redacted_text
    assert out[2].n_phone == 1 and "<phone>" in out[2].redacted_text
    assert "4567" not in out[2].redacted_text
    assert out[3].n_card == 1 and "<card>" in out[3].redacted_text
    assert "4111" not in out[3].redacted_text
    # The bare digit run is also phone-shaped: the audit counts it in
    # both columns, but the card pattern (declared first) owns the
    # rewrite.
    assert out[3].n_phone == 1 and "<phone>" not in out[3].redacted_text
    r4 = out[4]
    assert (r4.n_email, r4.n_phone, r4.n_card) == (0, 0, 0)
    assert r4.redacted_text == rows[3][1]
