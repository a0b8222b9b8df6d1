"""basket_pair_lift (operators/affinity.py) — staged registry
candidate; oracle parity at driver rigor plus lift semantics on
constructed baskets."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import affinity

from .oracle_utils import assert_matches_oracle


def test_affinity_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        affinity.basket_pair_lift(spark, sf_dir),
        affinity.AFFINITY_ORACLE,
        sf_dir,
    )


def test_lift_semantics_on_constructed_baskets(spark, monkeypatch):
    """Brands X and Y always co-occur (lift > 1, maximal); Z floats
    independently across many baskets. Exact values checked against
    the lift definition by hand."""
    rows = []
    # 10 baskets with {X, Y}; 10 baskets with {Z}; 5 with {X, Y, Z}
    oid = 0
    for _ in range(10):
        rows += [(oid, "X"), (oid, "Y")]
        oid += 1
    for _ in range(10):
        rows += [(oid, "Z")]
        oid += 1
    for _ in range(5):
        rows += [(oid, "X"), (oid, "Y"), (oid, "Z")]
        oid += 1
    detail = spark.createDataFrame(rows, "l_orderkey long, p_brand string")
    monkeypatch.setattr(affinity, "MIN_SUPPORT", 1)
    baskets = detail.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("p_brand")).alias("brands")
    )
    pairs = (
        baskets.where(F.size("brands") > 1)
        .select(F.explode(F.expr(affinity._BRAND_PAIRS)).alias("p"))
        .groupBy(F.col("p.brand_a").alias("a"), F.col("p.brand_b").alias("b"))
        .count()
        .collect()
    )
    got = {(r.a, r.b): r["count"] for r in pairs}
    # X,Y co-occur in 15 baskets of 25; X alone in 15, Y in 15, Z in 15
    assert got[("X", "Y")] == 15
    assert got[("X", "Z")] == 5
    assert got[("Y", "Z")] == 5
    # lift(X,Y) = 15 * 25 / (15 * 15) = 1.6667 > lift(X,Z) = 5*25/(15*15)
    lift_xy = 15 * 25 / (15 * 15)
    lift_xz = 5 * 25 / (15 * 15)
    assert lift_xy > 1.0 > lift_xz


def test_pair_expansion_not_a_self_join(spark, sf_dir):
    """The pair blowup must happen inside rows (array expansion after
    ONE basket aggregation shared by all three consumers), never as a
    detail self-join: the EXECUTED adaptive plan must show the basket
    exchange reused (pairs + marginals + order total = 2 reuses), no
    sort-merge join, no cartesian."""
    df = affinity.basket_pair_lift(spark, sf_dir)
    qe = df._jdf.queryExecution()
    qe.executedPlan().executeCollect()
    plan = qe.executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_output_ranked_and_bounded(spark, sf_dir):
    rows = affinity.basket_pair_lift(spark, sf_dir).orderBy("rank").collect()
    assert 0 < len(rows) <= affinity.TOP_PAIRS
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.n_co >= affinity.MIN_SUPPORT
        assert 0.0 < r.support <= 1.0


def test_recommendations_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        affinity.brand_recommendations(spark, sf_dir),
        affinity.RECS_ORACLE,
        sf_dir,
    )


def test_recommendations_never_suggest_owned_brands(spark, sf_dir):
    from customer_churn_prediction_spark.catalog import load_table

    owned = {
        (r.c_custkey, r.brand)
        for r in (
            load_table(spark, sf_dir, "lineitem")
            .join(load_table(spark, sf_dir, "part"),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(load_table(spark, sf_dir, "orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .select(F.col("o_custkey").alias("c_custkey"),
                    F.col("p_brand").alias("brand"))
            .distinct()
            .collect()
        )
    }
    recs = affinity.brand_recommendations(spark, sf_dir).collect()
    assert recs
    for r in recs:
        assert (r.c_custkey, r.rec_brand) not in owned
        assert (r.c_custkey, r.via_brand) in owned
        assert 1 <= r.rank <= affinity.TOP_RECS


def test_recommendation_pair_model_is_broadcast(spark, sf_dir):
    plan = (
        affinity.brand_recommendations(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stored_recommendations_equal_inline(spark, sf_dir):
    from .oracle_utils import assert_df_equal

    assert_df_equal(
        affinity.brand_recommendations(spark, sf_dir),
        affinity.brand_recommendations_stored(spark, sf_dir),
    )
    # model table exists, is tiny, and carries the full scored schema
    model = affinity.affinity_model_ingest(spark, sf_dir)
    assert model.count() <= 25 * 24 // 2
    assert {"brand_a", "brand_b", "lift", "support", "n_co"} <= set(
        model.columns
    )


def test_rec_eval_ndcg_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        affinity.rec_eval_ndcg(spark, sf_dir),
        affinity.REC_EVAL_ORACLE,
        sf_dir,
    )


def test_rec_eval_ndcg_invariants_and_signal(spark, sf_dir):
    """Metric algebra that must hold for ANY recommender, plus the
    model-has-signal check this eval exists to make visible.

    Per customer: ndcg = dcg/idcg <= 1 and is 0 without a hit, so
    mean_ndcg <= hit_rate; mrr <= 1 and is 0 without a hit, so
    mean_mrr <= hit_rate. And the lift model must beat chance on the
    held-out adoptions by a wide deterministic margin (measured 0.50
    hit-rate at sf0.001 vs ~0.2 for 3 random unowned brands)."""
    r = affinity.rec_eval_ndcg(spark, sf_dir).collect()[0]
    assert r.n_customers > 0
    assert r.k == affinity.TOP_RECS
    for v in (r.mean_ndcg, r.mean_mrr, r.hit_rate):
        assert 0.0 <= v <= 1.0
    assert r.mean_ndcg <= r.hit_rate
    assert r.mean_mrr <= r.hit_rate
    assert r.hit_rate > 0.3


def test_owned_cap_inactive_equals_uncapped(spark, sf_dir):
    """SCALE §10.9's opt-in serve lever at NEUTRAL settings must be a
    no-op: a cap at least as large as any customer's owned set (the
    brand universe bounds it) and the default min-support floor
    reproduce the default recommendations row-for-row — so turning
    the lever exists without changing the registered query's
    semantics."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.operators.affinity import (
        MIN_SUPPORT,
        brand_recommendations,
    )

    n_brands = (
        load_table(spark, sf_dir, "part")
        .select("p_brand").distinct().count()
    )
    base = sorted(
        map(tuple, brand_recommendations(spark, sf_dir).collect())
    )
    capped = sorted(
        map(
            tuple,
            brand_recommendations(
                spark,
                sf_dir,
                owned_cap=n_brands,
                min_support=MIN_SUPPORT,
            ).collect(),
        )
    )
    assert base == capped and base


def test_owned_cap_small_still_never_recommends_owned(spark, sf_dir):
    """With an aggressive cap the exclusion contract must hold
    against the FULL owned set (the cap only restricts which owned
    brands GENERATE candidates, never which are excluded)."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.operators.affinity import (
        brand_recommendations,
    )

    recs = brand_recommendations(spark, sf_dir, owned_cap=2)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    owned = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("p_brand").alias("rec_brand"),
        )
        .distinct()
    )
    bad = recs.join(owned, ["c_custkey", "rec_brand"]).count()
    assert bad == 0
    assert recs.count() > 0
