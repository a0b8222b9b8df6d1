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
