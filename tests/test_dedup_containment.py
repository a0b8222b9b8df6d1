"""dedup_containment (text/dedup.py staged split): asymmetric
containment dedup — oracle parity, the fragment-in-document case that
symmetric Jaccard structurally misses, direction and threshold
invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from customer_churn_prediction_spark.text import dedup

from .oracle_utils import assert_matches_oracle


def test_containment_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        dedup.containment_pairs(spark, sf_dir),
        dedup.ORACLES["dedup_containment"],
        sf_dir,
    )


def _write_docs(spark, tmp_path, docs):
    out = str(tmp_path / "docs_sf")
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).repartition(1).write.parquet(out + "/documents.parquet")
    return out


def test_containment_catches_what_jaccard_misses(spark, tmp_path):
    """A 30-word fragment embedded verbatim in a 600-word document:
    containment of the fragment is 1.0, but Jaccard is ~30/600 — far
    below JACCARD_THRESHOLD, so the symmetric pipeline is blind to it
    by construction."""
    rng = random.Random(7)
    words = [f"w{rng.randrange(10_000)}" for _ in range(600)]
    big = " ".join(words)
    fragment = " ".join(words[100:130])
    unrelated = " ".join(f"z{rng.randrange(10_000)}" for _ in range(50))
    sf = _write_docs(
        spark, tmp_path, [(1, big), (2, fragment), (3, unrelated)]
    )

    got = dedup.containment_pairs(spark, sf).collect()
    assert [(r.contained, r.container) for r in got] == [(2, 1)]
    assert got[0].containment == 1.0

    jac = dedup.ngram_jaccard_pairs(spark, sf).collect()
    assert jac == [], "sanity: symmetric Jaccard must miss the pair"


def test_containment_direction_and_threshold(spark, sf_dir):
    rows = dedup.containment_pairs(spark, sf_dir).collect()
    assert rows, "fixture corpus must contain containment pairs"
    ids = {(r.contained, r.container) for r in rows}
    for r in rows:
        assert r.containment >= dedup.CONTAINMENT_THRESHOLD
        assert r.contained != r.container
        # directed: at most one orientation per pair
        assert (r.container, r.contained) not in ids

    # the contained side's gram set is never larger than the container
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(dedup._word_shingles_spark()).alias("grams")
    ).select("doc_id", F.size("grams").alias("n"))
    sizes = {r.doc_id: r.n for r in d.collect()}
    for r in rows:
        assert sizes[r.contained] <= sizes[r.container]
