"""Market-basket affinity: brand co-occurrence support and lift.

The classic retail-analytics companion to the churn tiers: which pairs
of brands appear in the same order more often than independence
predicts. Support, confidence denominators, and lift all derive from
three counts — n_orders, per-brand order counts, per-pair
co-occurrence counts.

Scale shape:

* **Pair generation is the LSH-bucket idiom, not a self-join.** The
  naive form self-joins the (order, brand) detail on the order key —
  two shuffles of the detail and a join whose output IS the pair
  blowup. Instead each order's distinct brands are collected into one
  sorted array (one shuffle) and the i<j pairs are expanded with array
  expressions (``text/dedup.py``'s bucket expansion) — the quadratic
  step runs inside a row, bounded by basket size, and never crosses
  the network. At 100 TB add a basket-size cap (top-N items by spend)
  before expansion — the standard guard against pathological baskets.
* **Brand marginals ride a broadcast.** 25 brands — the pair-to-
  marginal join is two broadcast hash joins, no shuffle.
* The dimension join (lineitem → part for the brand) broadcasts the
  part side, mirroring the reference's fact⋈dim discipline
  (``operators/assembly.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


MIN_SUPPORT = 5  # co-occurrence count floor
TOP_PAIRS = 20

_BRAND_PAIRS = (
    "flatten(transform(sequence(1, size(brands) - 1), "
    "i -> transform(slice(brands, i + 1, size(brands) - i), "
    "y -> named_struct('brand_a', element_at(brands, i), 'brand_b', y))))"
)


def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top brand pairs by lift (ties broken by pair name), with their
    support counts. ``lift = n_co * n_orders / (n_a * n_b)``."""
    scored = _pair_lift_scored(spark, sf_dir)
    w = Window.orderBy(
        F.col("lift").desc(), F.col("brand_a"), F.col("brand_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_PAIRS)
    )


def _pair_lift_scored(
    spark: SparkSession, sf_dir: str, min_support: int = MIN_SUPPORT
) -> DataFrame:
    """The full scored pair table (min-support filtered, unranked) —
    shared by the report and the recommender."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    return _pair_lift_from_baskets(baskets, min_support=min_support)


def _pair_lift_from_baskets(
    baskets: DataFrame, min_support: int = MIN_SUPPORT
) -> DataFrame:
    """The scored pair model over any (l_orderkey, brands) baskets
    frame — the single source of truth for the model math, shared by
    the full-corpus report and the train-window eval fit
    (``rec_eval_ndcg``), so the two cannot drift. ``min_support``
    (default the module floor) is half of SCALE §10.9's named 100-TB
    lever: a harder floor shrinks the pair model — and with it every
    serve-side candidate fanout — before anything joins."""
    # One aggregation feeds pairs, marginals, and the order total; the
    # three consumers branch off the same shuffle (ReusedExchange).
    pairs = (
        # sequence(1, size-1) DESCENDS through index 0 on singleton
        # baskets (the dedup bucket expansion hits the same edge and
        # guards it with size > 1); singletons produce no pairs but
        # still count in the marginals and the order total below.
        baskets.where(F.size("brands") > 1)
        .select(F.explode(F.expr(_BRAND_PAIRS)).alias("p"))
        .groupBy(F.col("p.brand_a").alias("brand_a"),
                 F.col("p.brand_b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= min_support)
    )
    marginals = (
        baskets.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_brand"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    enriched = (
        pairs.join(
            F.broadcast(marginals.select(F.col("brand").alias("brand_a"),
                                         F.col("n_brand").alias("n_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(marginals.select(F.col("brand").alias("brand_b"),
                                         F.col("n_brand").alias("n_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return enriched.select(
        "brand_a",
        "brand_b",
        "n_co",
        "n_a",
        "n_b",
        F.round(F.col("n_co") / F.col("n_orders"), 6).alias("support"),
        F.round(
            F.col("n_co") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    )


TOP_RECS = 3


def brand_recommendations(
    spark: SparkSession,
    sf_dir: str,
    *,
    owned_cap: int | None = None,
    min_support: int | None = None,
) -> DataFrame:
    """Next-best-offer from the affinity model: for each customer, the
    top unowned brands whose lift with an OWNED brand is highest —
    the retention-action companion to the churn scores (what to put in
    the win-back offer).

    Scale shape: the pair model is tiny (≤ brands², min-support
    filtered) and rides BROADCAST joins; the owned-brands frame is one
    distinct over the fact join; candidate generation is
    owned ⋈ symmetric-pairs (broadcast), ownership exclusion a
    broadcast-able anti-join back onto owned, and both dedup/rank
    windows are keyed by customer — one customer-keyed shuffle end to
    end, never a brands×customers blowup.

    ``owned_cap`` / ``min_support`` (both opt-in, defaults = today's
    exact behavior) are SCALE §10.9's named 100-TB serve levers:
    ``owned_cap=N`` restricts each customer's candidate-GENERATING
    via-set to their top-N owned brands by spend (exclusion still
    judges the FULL owned set, so an owned brand is never
    recommended), and a harder ``min_support`` prunes the pair model
    itself. tests/test_affinity.py pins cap-inactive ≡ uncapped."""
    pairs = _pair_lift_scored(
        spark,
        sf_dir,
        min_support=(
            MIN_SUPPORT if min_support is None else min_support
        ),
    ).select("brand_a", "brand_b", "lift")
    return _recommend_from_pairs(
        spark, sf_dir, pairs, owned_cap=owned_cap
    )


def affinity_model_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-lift model as an at-rest managed table — the same
    fit-once discipline as the corpus bands / IVF lists / PQ codes: a
    recommendation serve should read the model, not re-mine the fact
    tables. The table is tiny (≤ brands², min-support filtered), so no
    partitioning — it exists to be broadcast."""
    from ..sources.writers import managed_ingest, sf_tag

    table = f"brand_pairs_{sf_tag(sf_dir)}"

    def _write(path: str) -> None:
        (
            _pair_lift_scored(spark, sf_dir)
            .write.mode("overwrite")
            .option("path", path)
            .format("parquet")
            .saveAsTable(table)
        )

    return managed_ingest(spark, table, _write)


def brand_recommendations_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``brand_recommendations`` in its production shape: the pair
    model comes from the at-rest table (``affinity_model_ingest``) —
    same output rows, same oracle; the basket-mining pass drops out of
    the per-serve cost entirely."""
    pairs = affinity_model_ingest(spark, sf_dir).select(
        "brand_a", "brand_b", "lift"
    )
    return _recommend_from_pairs(spark, sf_dir, pairs)


def _recommend_from_pairs(
    spark: SparkSession,
    sf_dir: str,
    pairs: DataFrame,
    owned_cap: int | None = None,
) -> DataFrame:
    """The shared serve tail: ownership, candidate join, exclusion,
    per-customer rank — over any (brand_a, brand_b, lift) model.
    With ``owned_cap`` the ownership frame carries a spend weight
    (sum of extended price per customer×brand) so the cap keeps each
    customer's top-N owned brands by real value."""
    cols = ["l_orderkey", "l_partkey"] + (
        ["l_extendedprice"] if owned_cap is not None else []
    )
    li = load_table(spark, sf_dir, "lineitem").select(*cols)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    fact = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    if owned_cap is None:
        owned = fact.select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("p_brand").alias("brand"),
        ).distinct()
    else:
        # round the spend sum to cents BEFORE it becomes a ranking
        # key: a raw double sum's partial-merge order varies run to
        # run, so ulp-level near-ties could swap which brands survive
        # the cap (the 6dp-logweight discipline, applied to prices)
        owned = (
            fact.groupBy(
                F.col("o_custkey").alias("c_custkey"),
                F.col("p_brand").alias("brand"),
            )
            .agg(
                F.round(F.sum("l_extendedprice"), 2).alias("weight")
            )
        )
    return _recommend_from_owned(owned, pairs, owned_cap=owned_cap)


def _recommend_from_owned(
    owned: DataFrame, pairs: DataFrame, owned_cap: int | None = None
) -> DataFrame:
    """Candidate join + exclusion + per-customer rank over any
    (c_custkey, brand) ownership frame — shared by the full-corpus
    recommender and the train-window eval (``rec_eval_ndcg``).

    ``owned_cap=N`` (SCALE §10.9's serve lever) caps the
    candidate-GENERATING via-set at each customer's top-N owned
    brands by ``weight`` (which the caller must supply on ``owned``
    when capping) — the candidate fanout becomes ≤ N × pair-degree
    per customer instead of |owned| × pair-degree. The exclusion
    array still judges the FULL owned set, so correctness of "never
    recommend an owned brand" is cap-independent; what the cap can
    change is only WHICH unowned brands win (low-spend via paths
    drop). The cap window rides the same customer-keyed clustering
    as the rest of the tail."""
    # ONE reference to ``pairs`` (r15): the old two-select union read
    # the model subtree twice, which forced a localCheckpoint of the
    # fitted pairs in the eval path purely to avoid a double fit; the
    # row-doubling explode emits the identical sym multiset off one
    # pass, so the model frame needs no materialization at all
    # (in-process alternating A/B at sf0.1 under heavy steal:
    # 6.91 -> 6.62 s median on rec_eval_ndcg, equal rows).
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("brand_a").alias("via_brand"),
                    F.col("brand_b").alias("rec_brand"),
                    F.col("lift").alias("lift"),
                ),
                F.struct(
                    F.col("brand_b").alias("via_brand"),
                    F.col("brand_a").alias("rec_brand"),
                    F.col("lift").alias("lift"),
                ),
            )
        ).alias("p")
    ).select("p.via_brand", "p.rec_brand", "p.lift")
    # Candidate fanout AFTER the customer clustering (r14
    # optimization). The r12 shape expanded owned × sym first (6.6M
    # candidate rows at sf0.1) and then shuffled that whole stream by
    # c_custkey to join the exclusion array — the candidate blowup
    # crossed an Exchange. Now the per-customer owned ARRAY is built
    # first (the only customer-keyed shuffle left), the via fanout is
    # an explode OVER that array, sym attaches map-side (broadcast),
    # and the ownership exclusion reads the owned_brands column
    # already on the row — so the expanded stream never crosses the
    # network, and the best-via aggregate plus the rank window below
    # still ride the same hash(c_custkey) clustering. Same candidate
    # set: explode(collect_set(brand)) ≡ the distinct owned rows.
    owned_arr = owned.select("c_custkey", "brand").groupBy(
        "c_custkey"
    ).agg(F.collect_set("brand").alias("owned_brands"))
    if owned_cap is not None:
        w_own = Window.partitionBy("c_custkey").orderBy(
            F.col("weight").desc(), "brand"
        )
        via = (
            owned.withColumn("_or", F.row_number().over(w_own))
            .where(F.col("_or") <= owned_cap)
            .select("c_custkey", F.col("brand").alias("via_brand"))
        )
        # both sides are c_custkey-clustered already (window / agg)
        base = via.join(owned_arr, "c_custkey")
    else:
        base = owned_arr.select(
            "c_custkey",
            "owned_brands",
            F.explode("owned_brands").alias("via_brand"),
        )
    unowned = (
        base.join(F.broadcast(sym), "via_brand")
        .where(~F.array_contains("owned_brands", F.col("rec_brand")))
        .select("c_custkey", "via_brand", "rec_brand", "lift")
    )
    # best via-path per (customer, candidate) as a HASH AGGREGATE
    # (r14 optimization): min(struct(-lift, via_brand)) picks exactly
    # the (lift DESC, via_brand ASC) winner the old row_number window
    # picked, but skips the window's full sort of the candidate
    # stream — and ClusteredDistribution((c_custkey, rec_brand)) is
    # satisfied by the exclusion join's hash(c_custkey) clustering
    # (subset rule), so the agg adds no Exchange, exactly like the
    # window it replaces. Double negation is exact (sign flip), so
    # lift round-trips bit-identically.
    best = (
        unowned.groupBy("c_custkey", "rec_brand")
        .agg(
            F.min(
                F.struct(
                    (-F.col("lift")).alias("nl"), "via_brand"
                )
            ).alias("w")
        )
        .select(
            "c_custkey",
            "rec_brand",
            F.col("w.via_brand").alias("via_brand"),
            (-F.col("w.nl")).alias("lift"),
        )
    )
    w_cust = Window.partitionBy("c_custkey").orderBy(
        F.col("lift").desc(), "rec_brand"
    )
    return (
        best.withColumn("rank", F.row_number().over(w_cust).cast("long"))
        .where(F.col("rank") <= TOP_RECS)
        .select("c_custkey", "rec_brand", "via_brand", "lift", "rank")
    )


import math as _math

# NDCG@K / MRR constants DERIVED from TOP_RECS (ADVICE r9: the 3-rank
# literals were correct only because TOP_RECS == 3 — a future K change
# would silently mis-gain ranks 4+ in both engines). Rounded once in
# Python and embedded as the SAME literals in the Spark plan and the
# oracle SQL — no cross-engine log2 in the hot path at all.
_GAIN = [                                               # 1/log2(r+1)
    1.0 if r == 1 else round(1.0 / _math.log2(r + 1), 6)
    for r in range(1, TOP_RECS + 1)
]
_IDCG = [round(sum(_GAIN[: k + 1]), 6) for k in range(TOP_RECS)]
_RECIP = [                                              # 1/r
    1.0 if r == 1 else round(1.0 / r, 6)
    for r in range(1, TOP_RECS + 1)
]

# Oracle CASE arms generated from the same lists, so the SQL can never
# hold more or fewer rank arms than TOP_RECS.
_GAIN_CASE = (
    "CASE r.rnk "
    + " ".join(
        f"WHEN {r} THEN {_GAIN[r - 1]!r}" for r in range(1, TOP_RECS)
    )
    + f" ELSE {_GAIN[-1]!r} END"
)
_IDCG_CASE = (
    f"CASE WHEN u.n_truth >= {TOP_RECS} THEN {_IDCG[-1]!r} "
    + " ".join(
        f"WHEN u.n_truth = {k} THEN {_IDCG[k - 1]!r}"
        for k in range(TOP_RECS - 1, 1, -1)
    )
    + f" ELSE {_IDCG[0]!r} END"
)
_RECIP_CASE = (
    "CASE p.first_hit "
    + " ".join(
        f"WHEN {r} THEN {_RECIP[r - 1]!r}"
        for r in range(1, TOP_RECS + 1)
    )
    + " ELSE 0.0 END"
)


def _eval_frames(spark: SparkSession, sf_dir: str) -> dict:
    """The leave-last-out protocol's intermediate frames, exposed so
    ``scripts/rec_eval_profile.py`` can time each phase of the EXACT
    production plan (VERDICT r9 item 5 — no copied logic to drift):
    split (the per-customer leave-last window), fit (the pair-lift
    model on train baskets), serve (recommendations from train
    ownership), and the grading inputs (truth / universe).
    ``rec_eval_ndcg`` consumes these frames unchanged."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = orders.withColumn("rn", F.row_number().over(w))
    train_orders = ranked.where(F.col("rn") > 1).select(
        "o_orderkey", "o_custkey"
    )
    test_orders = ranked.where(F.col("rn") == 1).select(
        "o_orderkey", "o_custkey"
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    brands = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_orderkey", F.col("p_brand").alias("brand"))

    # ONE lineitem-side join against the ranked orders (r14
    # optimization): train/test membership is the rn predicate, so
    # joining `brands` separately against the train and the test
    # slice probed the detail stream twice — the merged join carries
    # rn through and the two slices are filters over its output
    # (identical rows; the rn>1 / rn=1 filters are exhaustive and
    # disjoint).
    # The branches below (model fit, ownership, test truth, universe)
    # all re-derive from this one detail join. r14 materialized the
    # three shared frames once per run (lazy localCheckpoint) because
    # exchange reuse only collapses some of the duplicated lineage;
    # r15 DROPPED all three barriers: the alternating A/B at sf0.1
    # (near-zero host steal on those passes) measured the barrier-free
    # form faster per execution (4.85 → 3.77 s median, identical
    # rows) — the barriers' block writes and extra result stages cost
    # more than the residual recompute they saved — and a pure-lazy
    # build lets the session plan memo amortize the eval's per-pass
    # construction. Every execution still recomputes the fit and both
    # eval legs from parquet; at cluster scale the barrier-free form
    # also removes O(lineitem) unreplicated localCheckpoint blocks.
    ranked_brands = brands.join(
        ranked.select("o_orderkey", "o_custkey", "rn"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "o_custkey", "rn", "brand")
    train_brands = ranked_brands.where(F.col("rn") > 1).select(
        "l_orderkey", "o_custkey", "brand"
    )
    baskets_train = train_brands.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("brand")).alias("brands")
    )
    pairs = _pair_lift_from_baskets(baskets_train).select(
        "brand_a", "brand_b", "lift"
    )
    owned_train = train_brands.select(
        F.col("o_custkey").alias("c_custkey"), "brand"
    ).distinct()
    recs = _recommend_from_owned(owned_train, pairs)

    test_brands = ranked_brands.where(F.col("rn") == 1).select(
        F.col("o_custkey").alias("c_custkey"), "brand"
    ).distinct()
    truth = test_brands.join(
        owned_train, ["c_custkey", "brand"], "left_anti"
    )
    universe = (
        truth.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_truth"))
        .join(owned_train.select("c_custkey").distinct(), "c_custkey")
    )
    return {
        "train_orders": train_orders,
        "test_orders": test_orders,
        "pairs": pairs,
        "recs": recs,
        "truth": truth,
        "universe": universe,
    }


def rec_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@K / MRR / hit-rate for the brand recommender on held-out adoptions.

    The recs tier's eval member, completing the pattern
    ``ann_recall_eval`` set for ANN and ``dedup_recall_eval`` for
    dedup: a tier isn't done until its quality is a queryable number.

    Protocol: leave-last-ORDER-out per customer (the
    ``sequence_split_leave_last`` discipline). The pair-lift model AND
    the ownership frame are fit on every order EXCEPT each customer's
    last; truth is the brands that last order ADDS (not owned in
    train). Cold-start customers (no train history — single-order
    customers) are excluded, the standard eval universe. A customer in
    the universe whose owned brands produce no recommendations still
    counts (dcg = mrr = 0) — silently dropping them would inflate
    every metric.

    Scale shape: the model fit is the shared ``_pair_lift_from_baskets``
    (one basket shuffle), the serve tail the shared
    ``_recommend_from_owned`` (one customer-keyed shuffle), the grade
    one broadcast-able join of two customer-keyed frames; per-rank
    gains and IDCG are compile-time literals, so the whole metric is
    exact integer/6dp arithmetic — bit-comparable to the oracle."""
    frames = _eval_frames(spark, sf_dir)
    recs = frames["recs"]
    truth = frames["truth"]
    universe = frames["universe"]

    gain = F.when(F.col("rank") == 1, F.lit(_GAIN[0]))
    for _r in range(2, TOP_RECS):
        gain = gain.when(F.col("rank") == _r, F.lit(_GAIN[_r - 1]))
    gain = gain.otherwise(F.lit(_GAIN[-1]))
    hit = F.coalesce(F.col("hit"), F.lit(0))
    per_cust = (
        recs.join(
            truth.select(
                "c_custkey",
                F.col("brand").alias("rec_brand"),
                F.lit(1).alias("hit"),
            ),
            ["c_custkey", "rec_brand"],
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.round(F.sum(hit * gain), 6).alias("dcg"),
            F.min(F.when(F.col("hit") == 1, F.col("rank"))).alias(
                "first_hit"
            ),
        )
    )
    idcg = F.when(F.col("n_truth") >= TOP_RECS, F.lit(_IDCG[-1]))
    for _k in range(TOP_RECS - 1, 1, -1):
        idcg = idcg.when(F.col("n_truth") == _k, F.lit(_IDCG[_k - 1]))
    idcg = idcg.otherwise(F.lit(_IDCG[0]))
    mrr = F.when(F.col("first_hit") == 1, F.lit(_RECIP[0]))
    for _r in range(2, TOP_RECS + 1):
        mrr = mrr.when(F.col("first_hit") == _r, F.lit(_RECIP[_r - 1]))
    mrr = mrr.otherwise(F.lit(0.0))
    graded = universe.join(per_cust, "c_custkey", "left").select(
        F.round(
            F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
        ).alias("ndcg"),
        mrr.alias("mrr"),
        (F.coalesce(F.col("first_hit"), F.lit(0)) > 0)
        .cast("int")
        .alias("any_hit"),
    )
    return graded.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.lit(TOP_RECS).cast("long").alias("k"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("any_hit"), 6).alias("hit_rate"),
    )


# Shared CTE chain: the scored pair model over ANY ``baskets``
# (l_orderkey, p_brand) CTE — the SQL twin of
# ``_pair_lift_from_baskets``. The full-corpus oracles prepend the
# whole-lineitem baskets; the eval oracle prepends train-window
# baskets. One chain, two windows — like the Spark side.
_SCORED_CHAIN_SQL = f"""
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_co
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
),
marginals AS (
  SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_brand
  FROM baskets GROUP BY 1
),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM baskets),
scored AS (
  SELECT p.brand_a, p.brand_b, p.n_co, ma.n_brand AS n_a, mb.n_brand AS n_b,
         round(CAST(p.n_co AS DOUBLE) / t.n_orders, 6) AS support,
         round(CAST(p.n_co AS DOUBLE) * t.n_orders / (ma.n_brand * mb.n_brand),
               6) AS lift
  FROM pairs p
  JOIN marginals ma ON ma.brand = p.brand_a
  JOIN marginals mb ON mb.brand = p.brand_b
  CROSS JOIN tot t
)
"""

_SCORED_SQL = f"""
baskets AS (
  SELECT l_orderkey, p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
{_SCORED_CHAIN_SQL}
"""

AFFINITY_ORACLE = f"""
WITH {_SCORED_SQL}
SELECT * FROM (
  SELECT *, row_number() OVER (ORDER BY lift DESC, brand_a, brand_b) AS rank
  FROM scored)
WHERE rank <= {TOP_PAIRS}
"""

RECS_ORACLE = f"""
WITH {_SCORED_SQL},
owned AS (
  SELECT DISTINCT o.o_custkey AS c_custkey, p.p_brand AS brand
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
),
sym AS (
  SELECT brand_a AS via_brand, brand_b AS rec_brand, lift FROM scored
  UNION ALL
  SELECT brand_b AS via_brand, brand_a AS rec_brand, lift FROM scored
),
unowned AS (
  SELECT ow.c_custkey, s.via_brand, s.rec_brand, s.lift
  FROM owned ow JOIN sym s ON s.via_brand = ow.brand
  WHERE NOT EXISTS (
    SELECT 1 FROM owned o2
    WHERE o2.c_custkey = ow.c_custkey AND o2.brand = s.rec_brand
  )
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey, rec_brand
                                 ORDER BY lift DESC, via_brand) AS rn
    FROM unowned)
  WHERE rn = 1
)
SELECT c_custkey, rec_brand, via_brand, lift, rank FROM (
  SELECT c_custkey, rec_brand, via_brand, lift,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY lift DESC, rec_brand) AS rank
  FROM best)
WHERE rank <= {TOP_RECS}
"""

REC_EVAL_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderkey, o_custkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC,
                                     o_orderkey DESC) AS rn
  FROM orders
),
train_orders AS (SELECT o_orderkey, o_custkey FROM ranked WHERE rn > 1),
test_orders AS (SELECT o_orderkey, o_custkey FROM ranked WHERE rn = 1),
all_brands AS (
  SELECT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
baskets AS (
  SELECT b.l_orderkey, b.p_brand
  FROM all_brands b JOIN train_orders t ON t.o_orderkey = b.l_orderkey
),
{_SCORED_CHAIN_SQL},
owned AS (
  SELECT DISTINCT t.o_custkey AS c_custkey, b.p_brand AS brand
  FROM all_brands b JOIN train_orders t ON t.o_orderkey = b.l_orderkey
),
sym AS (
  SELECT brand_a AS via_brand, brand_b AS rec_brand, lift FROM scored
  UNION ALL
  SELECT brand_b AS via_brand, brand_a AS rec_brand, lift FROM scored
),
unowned AS (
  SELECT ow.c_custkey, s.via_brand, s.rec_brand, s.lift
  FROM owned ow JOIN sym s ON s.via_brand = ow.brand
  WHERE NOT EXISTS (
    SELECT 1 FROM owned o2
    WHERE o2.c_custkey = ow.c_custkey AND o2.brand = s.rec_brand
  )
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey, rec_brand
                                 ORDER BY lift DESC, via_brand) AS rn
    FROM unowned)
  WHERE rn = 1
),
recs AS (
  SELECT c_custkey, rec_brand, rnk FROM (
    SELECT c_custkey, rec_brand,
           row_number() OVER (PARTITION BY c_custkey
                              ORDER BY lift DESC, rec_brand) AS rnk
    FROM best)
  WHERE rnk <= {TOP_RECS}
),
test_brands AS (
  SELECT DISTINCT t.o_custkey AS c_custkey, b.p_brand AS brand
  FROM all_brands b JOIN test_orders t ON t.o_orderkey = b.l_orderkey
),
truth AS (
  SELECT tb.c_custkey, tb.brand FROM test_brands tb
  WHERE NOT EXISTS (
    SELECT 1 FROM owned o
    WHERE o.c_custkey = tb.c_custkey AND o.brand = tb.brand
  )
),
universe AS (
  SELECT t.c_custkey, count(*) AS n_truth FROM truth t
  WHERE EXISTS (SELECT 1 FROM owned o WHERE o.c_custkey = t.c_custkey)
  GROUP BY 1
),
per_cust AS (
  SELECT r.c_custkey,
         round(sum(CASE WHEN tr.brand IS NOT NULL THEN
                     {_GAIN_CASE}
                   ELSE 0.0 END), 6) AS dcg,
         min(CASE WHEN tr.brand IS NOT NULL THEN r.rnk END)
           AS first_hit
  FROM recs r LEFT JOIN truth tr
    ON tr.c_custkey = r.c_custkey AND tr.brand = r.rec_brand
  GROUP BY 1
),
graded AS (
  SELECT round(coalesce(p.dcg, 0.0)
               / {_IDCG_CASE}, 6) AS ndcg,
         {_RECIP_CASE} AS mrr,
         CASE WHEN p.first_hit IS NOT NULL THEN 1 ELSE 0 END AS any_hit
  FROM universe u LEFT JOIN per_cust p USING (c_custkey)
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST({TOP_RECS} AS BIGINT) AS k,
       round(avg(ndcg), 6) AS mean_ndcg,
       round(avg(mrr), 6) AS mean_mrr,
       round(avg(any_hit), 6) AS hit_rate
FROM graded
"""

# r10 graduation: rec_eval_ndcg enters the registry (slot freed by
# retiring ann_ivf_pq — registry.RETIRED); the module is now
# registered+staged (the vocab split pattern). The held-out
# hit-rate/NDCG report is the tier's quality evidence, and model/
# serve/eval share one core so the staged serving forms cannot drift
# from the driver-proven eval.
QUERIES = {
    "rec_eval_ndcg": rec_eval_ndcg,
}
ORACLES = {
    "rec_eval_ndcg": REC_EVAL_ORACLE,
}
# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_affinity.py holds
# them to driver rigor regardless. The stored form computes the same
# relation as the inline form (only the pair model's physical source
# differs), so it shares the oracle.
STAGED_QUERIES = {
    "basket_pair_lift": basket_pair_lift,
    "brand_recommendations": brand_recommendations,
    "brand_recommendations_stored": brand_recommendations_stored,
}
STAGED_ORACLES = {
    "basket_pair_lift": AFFINITY_ORACLE,
    "brand_recommendations": RECS_ORACLE,
    "brand_recommendations_stored": RECS_ORACLE,
}
