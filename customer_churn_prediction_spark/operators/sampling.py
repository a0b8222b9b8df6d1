"""Seeded distributed negative sampling — the training-pair generator
for implicit-feedback models (recommenders, two-tower retrieval,
contrastive churn-sequence models).

Implicit-feedback training data has only positives (the events a user
DID perform); the model also needs per-user NEGATIVES — items the
user never touched — and at 100 TB they must be drawn (a) without a
per-user driver loop, (b) deterministically (a re-run or a
hash-repartitioned re-read must emit the same pairs, or training is
unreproducible), and (c) without materializing the user × item
cross product. The reference stops at labeled positives
(``RF/randomforest_churn.scala:212-227``); this op is the extension a
sequence/retrieval pipeline bolts on.

Algorithm (all relational, no RNG state):

1. Positives = distinct (user, item) interactions.
2. Item vocabulary gets a dense index 0..n-1 — the two-level bucketed
   rank (``_dense_item_index``): no vocab-wide single-task sort, the
   only serial term is the bucket-count offset window (r12; the exact
   single-window form survives as the verified-equal twin).
3. Each user gets ``OVERSAMPLE × K_NEG`` candidate slots; slot j maps
   to index ``md5(seed|user|j) % n`` — a seeded hash, not an RNG, so
   both engines and every re-run agree row-for-row.
4. Candidates resolve to items through the vocab (broadcast — bounded
   by vocab size), positives are removed with a left-anti equi-join,
   per-user duplicate draws collapse to their first slot, and the
   first ``K_NEG`` surviving slots win.

Oversampling covers hash collisions with the user's own positives; a
user whose positives blanket the vocabulary legitimately yields fewer
(possibly zero) negatives — the honest outcome, asserted in tests
rather than papered over. Every stage is an equi-join or a bounded
explode (users × slots, a controlled constant fan-out): nothing here
is O(users × items).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

SEED = "ns1"
K_NEG = 4
OVERSAMPLE = 3
_N_SLOTS = K_NEG * OVERSAMPLE

# Value-range width of one index bucket in the two-level rank/CDF
# below: the serial ordered-window term shrinks from |vocab| rows to
# |vocab|/width bucket rows (10⁸ items → ~24k bucket partials).
_IDX_BUCKET_WIDTH = 4096


def _dense_item_index(vocab: DataFrame) -> DataFrame:
    """(item, idx): the dense 0..V-1 index by global item order — the
    two-level bucketed rank (r12, VERDICT r11 item 4).

    The r11 form ranked the whole vocabulary through ONE ordered
    window task (``row_number().over(Window.orderBy("item"))``) —
    fine for a retail catalog, a single-task wall at web-scale item
    universes (10⁸+). Same remedy the repo used for DSIR and
    topk/quantiles: (1) hash-aggregate per value-range bucket
    ``item div W`` (distributed, order-aligned because the bucket id
    is monotone in item); (2) ONE ordered window over the
    BUCKET-count frame (V/W rows — the only serial term left)
    computes per-bucket offsets; (3) rank WITHIN each bucket
    (window partitioned by bucket — distributed) and add the offset.
    Bit-identical to the exact twin ``_dense_item_index_exact``
    (equality pytest tests/test_negative_sampling.py)."""
    bk = F.expr(f"item div {_IDX_BUCKET_WIDTH}")
    counts = vocab.groupBy(bk.alias("bk")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_bk = Window.orderBy("bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        "bk",
        F.coalesce(F.sum("n").over(w_bk), F.lit(0)).alias("off"),
    )
    w_in = Window.partitionBy("bk").orderBy("item")
    return (
        vocab.withColumn("bk", bk)
        .join(offs, "bk")
        .select(
            "item",
            (F.col("off") + F.row_number().over(w_in) - 1).alias(
                "idx"
            ),
        )
    )


def _dense_item_index_exact(vocab: DataFrame) -> DataFrame:
    """The r11 single-window form — every vocab row through one
    global ordered rank task. Verified-equal twin of
    ``_dense_item_index`` (the form that pins the semantics; holds no
    serving path)."""
    return vocab.select(
        "item",
        (F.row_number().over(Window.orderBy("item")) - 1).alias(
            "idx"
        ),
    )


def project_purchases(events: DataFrame) -> DataFrame:
    """THE one purchase projection every op in this tier shares —
    batch pairs, negative sampling, and the streaming twin
    (``streaming/pairs.py``) all call this, so the twins cannot
    drift apart silently. ``try_cast`` (not ``cast``): a malformed
    ``k`` payload drops the row on both engines instead of raising
    under ANSI (the oracles mirror with ``TRY_CAST``)."""
    return (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.get_json_object("props", "$.k")
            .try_cast("int")
            .alias("item"),
            "ts",
            "event_id",
        )
        .where(F.col("item").isNotNull())
    )


def _interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return project_purchases(e).select("user_id", "item").distinct()


def negative_samples_frame(
    inter: DataFrame,
    *,
    k: int = K_NEG,
    oversample: int = OVERSAMPLE,
    seed: str = SEED,
) -> DataFrame:
    """Core sampler over any distinct (user_id, item) positives frame:
    (user_id, neg_item, rank) with rank 1..k in draw order."""
    n_slots = k * oversample
    vocab = inter.select("item").distinct()
    vocab_idx = _dense_item_index(vocab)
    n_items = vocab.agg(F.count(F.lit(1)).alias("n_items"))

    # Column-built (no string splicing): a seed is data, not SQL.
    draw = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed),
                        F.lit("|"),
                        F.col("user_id").cast("string"),
                        F.lit("|"),
                        F.col("slot").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.col("n_items"),
    )
    cands = (
        inter.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(n_items))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_slots - 1))
            ).alias("slot"),
            "n_items",
        )
        .select("user_id", "slot", draw.alias("idx"))
    )

    negs = (
        cands.join(F.broadcast(vocab_idx), "idx")
        .select("user_id", "slot", "item")
        .join(inter, ["user_id", "item"], "left_anti")
        .groupBy("user_id", "item")
        .agg(F.min("slot").alias("slot"))
    )
    by_user = Window.partitionBy("user_id").orderBy("slot")
    return (
        negs.select(
            "user_id",
            F.col("item").alias("neg_item"),
            F.row_number().over(by_user).cast("int").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K seeded negatives per purchasing user over the events table."""
    return negative_samples_frame(_interactions(spark, sf_dir))


# ------------------------------------------- popularity-weighted draw

W_SEED = "nsw1"
_CDF_BUCKETS = 1024


def _item_cdf(freq: DataFrame) -> DataFrame:
    """(item, lo, hi): the exact-integer cumulative weight interval of
    each item by global item order — the two-level bucketed running
    sum (r12, VERDICT r11 item 4; same shape as
    ``_dense_item_index``): per-bucket weight sums (distributed hash
    aggregate), ONE ordered window over the bucket-count frame for
    the offsets, the within-bucket running sum partitioned by bucket.
    All integer arithmetic — no float CDF drift, bit-identical to the
    exact twin ``_item_cdf_exact``."""
    bk = F.expr(f"item div {_IDX_BUCKET_WIDTH}")
    per = freq.groupBy(bk.alias("bk")).agg(
        F.sum("w").cast("long").alias("wsum")
    )
    w_bk = Window.orderBy("bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per.select(
        "bk",
        F.coalesce(F.sum("wsum").over(w_bk), F.lit(0)).alias("woff"),
    )
    w_in = Window.partitionBy("bk").orderBy("item").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        freq.withColumn("bk", bk)
        .join(offs, "bk")
        .select(
            "item",
            "w",
            (F.col("woff") + F.sum("w").over(w_in)).alias("hi"),
        )
        .select("item", (F.col("hi") - F.col("w")).alias("lo"), "hi")
    )


def _item_cdf_exact(freq: DataFrame) -> DataFrame:
    """The r11 single-window CDF — the whole vocabulary's running sum
    through one global ordered task. Verified-equal twin of
    ``_item_cdf``."""
    cum = Window.orderBy("item").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return freq.select(
        "item",
        "w",
        F.sum("w").over(cum).alias("hi"),
    ).select("item", (F.col("hi") - F.col("w")).alias("lo"), "hi")


def _hash_draw(seed: str, modulus) -> "F.Column":
    """Seeded 60-bit md5 draw on (user_id, slot), reduced mod
    ``modulus`` (a column). Column-built — the seed is data."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed),
                        F.lit("|"),
                        F.col("user_id").cast("string"),
                        F.lit("|"),
                        F.col("slot").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        modulus,
    )


def weighted_negative_samples_frame(
    inter: DataFrame,
    *,
    k: int = K_NEG,
    oversample: int = OVERSAMPLE,
    seed: str = W_SEED,
) -> DataFrame:
    """Popularity-weighted negatives: items are drawn with probability
    proportional to their interaction count (the standard
    implicit-feedback practice — uniform negatives are too easy; the
    model must learn to rank positives above POPULAR items it has
    not seen with this user).

    The classic weighted draw is a binary search over the CDF — a
    per-row loop. The relational, 100-TB shape used here is a
    **quantized-CDF equi-join**: the vocabulary CDF (model-sized) is
    exploded into the fixed ``_CDF_BUCKETS`` grid — each item covers
    the buckets its [lo, hi) weight interval spans, ~(V + B) span
    rows total — and a draw d ∈ [0, total_weight) equi-joins on
    ``bucket(d) = d·B div total`` with the exact interval check as
    the join residual. No range join, no nested loop: one broadcast
    hash join on the bucket key. All weights and boundaries are exact
    integers (interaction counts), so both engines agree bit-for-bit
    — no float CDF drift. Everything downstream (anti-join positives,
    first-k surviving slots) is the uniform sampler's pipeline."""
    n_slots = k * oversample
    freq = inter.groupBy("item").agg(F.count(F.lit(1)).alias("w"))
    cdf = _item_cdf(freq)
    total = freq.agg(F.sum("w").cast("bigint").alias("total_w"))

    # `div` (integer division), never `/`: bigint / bigint is DOUBLE
    # in Spark and loses exactness past 2^53 — bucket boundaries must
    # be bit-exact on both engines.
    spans = cdf.crossJoin(F.broadcast(total)).select(
        "item",
        "lo",
        "hi",
        F.expr(
            f"explode(sequence((lo * {_CDF_BUCKETS}) div total_w, "
            f"((hi - 1) * {_CDF_BUCKETS}) div total_w))"
        ).alias("bucket"),
    )

    cands = (
        inter.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_slots - 1))
            ).alias("slot"),
            "total_w",
        )
        .select(
            "user_id",
            "slot",
            _hash_draw(seed, F.col("total_w")).alias("d"),
            "total_w",
        )
        .select(
            "user_id",
            "slot",
            "d",
            F.expr(f"(d * {_CDF_BUCKETS}) div total_w").alias("bucket"),
        )
    )

    negs = (
        cands.join(
            F.broadcast(spans),
            (cands.bucket == spans.bucket)
            & (F.col("d") >= F.col("lo"))
            & (F.col("d") < F.col("hi")),
        )
        .select("user_id", "slot", "item")
        .join(inter, ["user_id", "item"], "left_anti")
        .groupBy("user_id", "item")
        .agg(F.min("slot").alias("slot"))
    )
    by_user = Window.partitionBy("user_id").orderBy("slot")
    return (
        negs.select(
            "user_id",
            F.col("item").alias("neg_item"),
            F.row_number().over(by_user).cast("int").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def negative_sampling_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K popularity-weighted seeded negatives per purchasing user."""
    return weighted_negative_samples_frame(_interactions(spark, sf_dir))


# --------------------------------------------------- positive pairs

W_CTX = 8


def sequence_pairs_frame(
    ev: DataFrame, *, w_ctx: int = W_CTX
) -> DataFrame:
    """Next-item-prediction pairs from any (user_id, item, ts,
    event_id) event frame: one training example per event that has
    history — the last ``w_ctx`` items before it (oldest→newest,
    pipe-packed like ``user_event_sequences``) and the event's item
    as the target.

    This is the positive half of the training-pair tier (the sampler
    above draws the negatives): the dataloader step that turns an
    event log into supervised sequence examples. One shuffle — the
    per-user window; both the context (a bounded ROWS frame, never
    the whole partition) and the position come off the SAME window,
    so adding the pairs costs nothing beyond `user_event_sequences`'
    own shape. Ordering is (ts, event_id) so ties are deterministic
    in any engine; the first event per user has no history and emits
    nothing (asserted, not silently padded)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ctx = F.collect_list("item").over(w.rowsBetween(-w_ctx, -1))
    d = ev.select(
        "user_id",
        F.col("item").alias("target_item"),
        F.row_number().over(w).cast("long").alias("pos"),
        ctx.alias("ctx"),
    )
    return d.where(F.size("ctx") > 0).select(
        "user_id",
        "pos",
        "target_item",
        F.expr(
            "concat_ws('|', transform(ctx, x -> cast(x as string)))"
        ).alias("context"),
        F.size("ctx").cast("int").alias("ctx_len"),
    )


def sequence_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(context, next-item) training pairs over the purchase stream."""
    e = load_table(spark, sf_dir, "events")
    return sequence_pairs_frame(project_purchases(e))


def sequence_split_leave_last(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pairs with the standard leave-last-out evaluation split:
    each user's chronologically LAST example is ``valid``, everything
    earlier is ``train``. This is the sequence-model analogue of the
    corpus tier's leak-proof split — a random row split would leak
    future interactions of the same user into training, inflating
    offline metrics exactly the way near-dup leakage inflates LM
    evals.

    Cost: one extra window over the SAME user_id partitioning the
    pairs window already established — Spark reuses the partitioning,
    so no additional Exchange (pinned by the shuffle-budget golden:
    this query budgets the same single shuffle as
    ``sequence_training_pairs``)."""
    pairs = sequence_training_pairs(spark, sf_dir)
    last_pos = F.max("pos").over(Window.partitionBy("user_id"))
    return pairs.select(
        "user_id",
        "pos",
        "target_item",
        "context",
        "ctx_len",
        F.when(F.col("pos") == last_pos, F.lit("valid"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


NEGATIVE_SAMPLING_ORACLE = f"""
WITH inter AS (
  SELECT DISTINCT user_id, TRY_CAST(props ->> 'k' AS INTEGER) AS item
  FROM events
  WHERE event_type = 'purchase'
    AND TRY_CAST(props ->> 'k' AS INTEGER) IS NOT NULL
),
vocab AS (
  SELECT item, ROW_NUMBER() OVER (ORDER BY item) - 1 AS idx
  FROM (SELECT DISTINCT item FROM inter)
),
n AS (SELECT COUNT(*) AS n_items FROM vocab),
slots AS (SELECT range AS slot FROM range({_N_SLOTS})),
cands AS (
  SELECT u.user_id, s.slot,
    CAST(('0x' || substring(md5('{SEED}|' || CAST(u.user_id AS VARCHAR)
          || '|' || CAST(s.slot AS VARCHAR)), 1, 15)) AS BIGINT)
      % n.n_items AS idx
  FROM (SELECT DISTINCT user_id FROM inter) u
  CROSS JOIN slots s CROSS JOIN n
),
negs AS (
  SELECT c.user_id, v.item, MIN(c.slot) AS slot
  FROM cands c JOIN vocab v USING (idx)
  WHERE NOT EXISTS (
    SELECT 1 FROM inter i
    WHERE i.user_id = c.user_id AND i.item = v.item
  )
  GROUP BY 1, 2
),
ranked AS (
  SELECT user_id, item AS neg_item,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slot)
         AS INTEGER) AS rank
  FROM negs
)
SELECT user_id, neg_item, rank FROM ranked WHERE rank <= {K_NEG}
"""

SEQUENCE_PAIRS_ORACLE = f"""
WITH ev AS (
  SELECT user_id, TRY_CAST(props ->> 'k' AS INTEGER) AS item,
         ts, event_id
  FROM events
  WHERE event_type = 'purchase'
    AND TRY_CAST(props ->> 'k' AS INTEGER) IS NOT NULL
),
seq AS (
  SELECT user_id, item AS target_item,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS pos,
    list(item) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {W_CTX} PRECEDING AND 1 PRECEDING)
      AS ctx
  FROM ev
)
SELECT user_id, CAST(pos AS BIGINT) AS pos, target_item,
       array_to_string(ctx, '|') AS context,
       CAST(len(ctx) AS INTEGER) AS ctx_len
FROM seq WHERE len(ctx) > 0
"""

WEIGHTED_SAMPLING_ORACLE = f"""
WITH inter AS (
  SELECT DISTINCT user_id, TRY_CAST(props ->> 'k' AS INTEGER) AS item
  FROM events
  WHERE event_type = 'purchase'
    AND TRY_CAST(props ->> 'k' AS INTEGER) IS NOT NULL
),
freq AS (SELECT item, COUNT(*) AS w FROM inter GROUP BY item),
cdf AS (
  SELECT item,
    SUM(w) OVER (ORDER BY item
                 ROWS UNBOUNDED PRECEDING) - w AS lo,
    SUM(w) OVER (ORDER BY item ROWS UNBOUNDED PRECEDING) AS hi
  FROM freq
),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM freq),
spans AS (
  SELECT c.item, c.lo, c.hi,
    unnest(generate_series(
      CAST((c.lo * {_CDF_BUCKETS}) // t.total_w AS BIGINT),
      CAST(((c.hi - 1) * {_CDF_BUCKETS}) // t.total_w AS BIGINT)))
      AS bucket
  FROM cdf c CROSS JOIN t
),
slots AS (SELECT range AS slot FROM range({_N_SLOTS})),
cands AS (
  SELECT u.user_id, s.slot,
    CAST(('0x' || substring(md5('{W_SEED}|' || CAST(u.user_id AS VARCHAR)
          || '|' || CAST(s.slot AS VARCHAR)), 1, 15)) AS BIGINT)
      % t.total_w AS d,
    t.total_w
  FROM (SELECT DISTINCT user_id FROM inter) u
  CROSS JOIN slots s CROSS JOIN t
),
negs AS (
  SELECT c.user_id, sp.item, MIN(c.slot) AS slot
  FROM cands c
  JOIN spans sp
    ON sp.bucket = (c.d * {_CDF_BUCKETS}) // c.total_w
   AND c.d >= sp.lo AND c.d < sp.hi
  WHERE NOT EXISTS (
    SELECT 1 FROM inter i
    WHERE i.user_id = c.user_id AND i.item = sp.item
  )
  GROUP BY 1, 2
),
ranked AS (
  SELECT user_id, item AS neg_item,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slot)
         AS INTEGER) AS rank
  FROM negs
)
SELECT user_id, neg_item, rank FROM ranked WHERE rank <= {K_NEG}
"""

SEQUENCE_SPLIT_ORACLE = f"""
WITH pairs AS ({SEQUENCE_PAIRS_ORACLE})
SELECT user_id, pos, target_item, context, ctx_len,
  CASE WHEN pos = MAX(pos) OVER (PARTITION BY user_id)
       THEN 'valid' ELSE 'train' END AS split
FROM pairs
"""

TRAIN_FRAC = 0.8       # share of the corpus TIME RANGE that trains
EMBARGO_HOURS = 24     # purged gap between train end and test start


def events_split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split with an embargo gap — the forecasting-safe split.

    ``sequence_split_leave_last`` splits per user (recommender
    protocol); this is the TIME-based protocol every
    forecasting/feature-store eval needs: train on everything before
    the cutoff, hold out everything after the cutoff + an EMBARGO
    window, and PURGE the events inside the gap (labels computed from
    a horizon near the boundary would otherwise leak across it — the
    purged/embargoed split of de Prado's "Advances in Financial
    Machine Learning", the time-series CV standard).

    The cutoff is range-based, not rank-based: T = min_ts +
    TRAIN_FRAC·(max_ts − min_ts) on exact integer microseconds (a
    count-based cutoff would need a global rank — the DSIR
    scale-killer — while min/max are footer-stats aggregates, and
    "train on the first 80% of the time range" is the production
    phrasing anyway). floor() before the long cast in BOTH engines
    (Spark's double→long cast truncates, DuckDB's rounds — the one
    cross-engine cast trap this op has).

    Scale shape: one 1-row min/max aggregate broadcast into a pure
    map — no shuffle of the event stream at all; the assignment
    column is computed at scan speed and the split is reproducible
    from the data alone (no RNG, no wall clock).

    Null-key contract (r12, ADVICE r11): rows with NULL ts or
    user_id are dropped up front — a NULL ts compares false in both
    ``when`` branches and would silently land in the 'test' bucket
    (oracle-consistently, but semantically wrong for a purged split);
    same discipline as the decay/resample cores (ADVICE r10)."""
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )
    bounds = e.agg(
        F.unix_micros(F.min("ts")).alias("t0"),
        F.unix_micros(F.max("ts")).alias("t1"),
    )
    cut = F.col("t0") + F.floor(
        F.lit(TRAIN_FRAC) * (F.col("t1") - F.col("t0"))
    ).cast("long")
    test_start = cut + F.lit(EMBARGO_HOURS * 3_600_000_000)
    return e.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "user_id",
        F.when(F.unix_micros("ts") < cut, F.lit("train"))
        .when(F.unix_micros("ts") < test_start, F.lit("embargo"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


TEMPORAL_SPLIT_ORACLE = f"""
WITH src AS (
  SELECT event_id, user_id, ts FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
b AS (
  SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM src
),
c AS (
  SELECT t0, t1,
         t0 + CAST(floor({TRAIN_FRAC!r} * (t1 - t0)) AS BIGINT) AS cut
  FROM b
)
SELECT e.event_id, e.user_id,
       CASE WHEN epoch_us(e.ts) < c.cut THEN 'train'
            WHEN epoch_us(e.ts) < c.cut + {EMBARGO_HOURS * 3_600_000_000}
              THEN 'embargo'
            ELSE 'test' END AS split
FROM src e, c
"""


QUERIES = {
    "negative_sampling": negative_sampling,
    "negative_sampling_weighted": negative_sampling_weighted,
    "sequence_training_pairs": sequence_training_pairs,
    "sequence_split_leave_last": sequence_split_leave_last,
    # r11: purged temporal split (embargoed time-based protocol).
    "events_split_temporal": events_split_temporal,
}

ORACLES = {
    "negative_sampling": NEGATIVE_SAMPLING_ORACLE,
    "negative_sampling_weighted": WEIGHTED_SAMPLING_ORACLE,
    "sequence_training_pairs": SEQUENCE_PAIRS_ORACLE,
    "sequence_split_leave_last": SEQUENCE_SPLIT_ORACLE,
    "events_split_temporal": TEMPORAL_SPLIT_ORACLE,
}
