"""JL random-projection tier: the properties the op stands on.

Oracle parity (bit-exact — shared literal sign matrix) lives in
STAGED_CORRECTNESS.json; the recall grade lives in
``ann_recall_matrix``. This file pins:

- the JL distortion bound actually holds on the fixture (projected
  cosine tracks exact cosine within the ~1/sqrt(k) theory band);
- the re-rank stage reports EXACT cosines (any pair the op returns
  carries the same similarity the brute-force tier would report);
- output contract: TOP_K rows per query, ranks 1..K, descending.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.similarity import ann


def test_projected_cosine_tracks_exact_within_jl_band(spark, sf_smoke):
    e = ann._project(ann._embeddings(spark, sf_smoke))
    a = e.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), F.col("p").alias("pa"),
        F.col("pn").alias("pna"),
    )
    b = e.where((F.col("vec_id") >= 30) & (F.col("vec_id") < 60)).select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), F.col("p").alias("pb"),
        F.col("pn").alias("pnb"),
    )
    pairs = a.crossJoin(b).select(
        ann._cosine("va", "vb", "na", "nb").alias("exact"),
        ann._cosine("pa", "pb", "pna", "pnb").alias("proj"),
    ).collect()
    assert len(pairs) == 900
    devs = [abs(r.exact - r.proj) for r in pairs]
    band = 1.0 / (ann.RP_DIMS ** 0.5)
    # mean deviation well inside one JL standard error; a 4-sigma cap
    # on the worst pair keeps this deterministic (fixed fixture + a
    # fixed md5 matrix — nothing is sampled at test time)
    assert sum(devs) / len(devs) < band
    assert max(devs) < 4 * band


def test_reported_cosines_are_exact_not_projected(spark, sf_smoke):
    rp = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in ann.ann_rp_topk(spark, sf_smoke).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in ann.ann_bruteforce_topk(spark, sf_smoke).collect()
    }
    shared = set(rp) & set(exact)
    assert shared, "some overlap with the exact top-k must exist"
    for k in shared:
        assert rp[k] == exact[k]


def test_output_contract(spark, sf_smoke):
    rows = ann.ann_rp_topk(spark, sf_smoke).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(ann.N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, ann.TOP_K + 1))
        sims = [r.cosine_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)
