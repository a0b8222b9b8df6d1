"""End-to-end churn model jobs — the reference's ``modelPipeline``
(``RF/randomforest_churn.scala:234-282``) per model family, exposed as
registry queries (rows-only: ML fits are not SQL-expressible; the
driver records the weaker check per the contract).

Each job: training set (features ⋈ label) → seeded 80/20 split →
feature pipeline + estimator in one ``Pipeline`` → fit → score test →
one metrics row (model, n_train, n_test, auc, accuracy, precision,
recall, f1).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dataset, evaluation, models
from .pipeline import build_feature_pipeline


ROWS_PER_FIT_PARTITION = 20_000

# Cached (sized training frame, row count) per (application, sf_dir),
# shared by the four registry model jobs so features ⋈ label is computed
# once, not four times. Only the registry path opts in
# (share_cache=True); the default API path keeps its own cache +
# unpersist lifecycle. Keyed on applicationId, NOT id(spark): CPython
# can reuse a stopped session's id() for a new session, which would
# serve cached frames bound to a dead SparkContext (r2 ADVICE).
_SHARED_TRAINING: dict[tuple[str, str], tuple[DataFrame, int]] = {}


def _cache_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    return (spark.sparkContext.applicationId, sf_dir)


def clear_shared_caches(unpersist: bool = True) -> None:
    """Release the registry-path shared frames (call between sessions
    or to free executor memory mid-session)."""
    for frame, _ in _SHARED_TRAINING.values():
        if unpersist:
            try:
                frame.unpersist()
            except Exception:
                pass  # session already stopped
    _SHARED_TRAINING.clear()
    for train_t, test_t, _, _ in _SHARED_VECTORIZED.values():
        if unpersist:
            try:
                train_t.unpersist()
                test_t.unpersist()
            except Exception:
                pass
    _SHARED_VECTORIZED.clear()


def _sized(data: DataFrame, n_rows: int) -> DataFrame:
    # Size partitions to the data before iterative fitting: MLlib's
    # per-iteration treeAggregate pays a scheduler round per partition,
    # so 32 shuffle partitions of ~50 rows each is pure overhead.
    # coalesce() only ever narrows, so at real scale (rows >>
    # partitions * ROWS_PER_FIT_PARTITION) it is a no-op.
    parts = max(1, -(-n_rows // ROWS_PER_FIT_PARTITION))
    return data.coalesce(parts)


def _shared_training_set(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    key = _cache_key(spark, sf_dir)
    hit = _SHARED_TRAINING.get(key)
    if hit is None:
        data = dataset.churn_training_set(spark, sf_dir).cache()
        n_rows = data.count()
        hit = (_sized(data, n_rows), n_rows)
        _SHARED_TRAINING[key] = hit
    return hit


# (fitted-feature train, test, n_train, n_test) per (application,
# sf_dir): the four registry model jobs share one feature-pipeline fit
# and one pair of cached vectorized splits — the standard
# fit-features-once, sweep-estimators pattern. Results are
# bit-identical to fitting the composed Pipeline per job (the feature
# stages fit on the same train split either way).
_SHARED_VECTORIZED: dict[tuple[str, str], tuple] = {}


def _shared_vectorized_split(spark: SparkSession, sf_dir: str) -> tuple:
    key = _cache_key(spark, sf_dir)
    hit = _SHARED_VECTORIZED.get(key)
    if hit is None:
        sized, _ = _shared_training_set(spark, sf_dir)
        train, test = dataset.train_test_split(sized)
        feat = build_feature_pipeline().fit(train)
        train_t = feat.transform(train).select("features", "label").cache()
        test_t = feat.transform(test).select("features", "label").cache()
        hit = (train_t, test_t, train_t.count(), test_t.count())
        _SHARED_VECTORIZED[key] = hit
    return hit


def train_and_evaluate(
    spark: SparkSession,
    sf_dir: str,
    model_key: str,
    profile: str = "reference",
    share_cache: bool = False,
) -> DataFrame:
    if share_cache:
        train, test, n_train, n_test = _shared_vectorized_split(spark, sf_dir)
        estimator = models.make_estimator(model_key, profile)
        model = estimator.fit(train)
        scored = model.transform(test).cache()
        try:
            m = evaluation.confusion_metrics(scored)
            roc = evaluation.auc(scored)
        finally:
            scored.unpersist()
    else:
        data = dataset.churn_training_set(spark, sf_dir).cache()
        try:
            sized = _sized(data, data.count())
            train, test = dataset.train_test_split(sized)
            estimator = models.make_estimator(model_key, profile)
            pipe = Pipeline(
                stages=[*build_feature_pipeline().getStages(), estimator]
            )
            fitted = pipe.fit(train)
            scored = fitted.transform(test).cache()
            try:
                m = evaluation.confusion_metrics(scored)
                roc = evaluation.auc(scored)
                n_train, n_test = train.count(), test.count()
            finally:
                scored.unpersist()
        finally:
            data.unpersist()
    return spark.createDataFrame(
        [
            (
                model_key, n_train, n_test, float(roc),
                float(m["accuracy"]), float(m["precision"]),
                float(m["recall"]), float(m["f1"]),
            )
        ],
        "model string, n_train long, n_test long, auc double, accuracy double,"
        " precision double, recall double, f1 double",
    )


def features_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted feature pipeline's output surface as nonzero
    (c_custkey, slot, value) coordinates — the sparse-COO projection of
    the assembled vector. Shares the registry's cached training frame
    with the model jobs.

    Coordinates instead of one array<double> column for two reasons:
    the driver's canonicalizer cannot sort array cells (pandas
    ``sort_values`` raises on object lists — this entry crashed the r1
    and r2 drivers), and the flat form is DuckDB-oracle-able: the
    bucketize→index→one-hot vocabulary is deterministic (StringIndexer
    ranks labels by frequency desc, ties alphabetically — reproduced
    in SQL with row_number()), so every vector slot is a plain SQL
    expression over the training table."""
    data, _ = _shared_training_set(spark, sf_dir)
    fitted = build_feature_pipeline().fit(data)
    out = fitted.transform(data)
    return out.select(
        "c_custkey",
        F.posexplode(vector_to_array("features")).alias("slot", "value"),
    ).where(F.col("value") != 0.0)


def banded_fit(spark: SparkSession, sf_dir: str, model_key: str) -> DataFrame:
    """Oracle-able metric-band contract for an iterative fit — the
    ``approx_distinct_users`` graduation pattern applied to the four
    model jobs. The fit itself is not SQL-expressible, but its metric
    CONTRACT is checkable: on the driver's memoryless synthetic labels
    (SCALE.md §11) the held-out AUC is a null Mann-Whitney draw around
    0.5 and a no-signal classifier's accuracy lies between the class
    shares, so we emit booleans asserting each metric sits inside its
    5-sigma null band (computed from the ACTUAL test-set class counts,
    not hard-coded — the band adapts to sf). The DuckDB oracle is the
    trivially-true row: a broken fit (label leakage → AUC ≈ 1,
    inverted scoring → AUC ≈ 0, degenerate-beyond-majority accuracy)
    flips a boolean and hash-mismatches.

    Upper AUC cap: min(band hi, 0.84) — the reference's published
    real-data ceiling (BASELINE.md:34-38, AUC 0.816-0.833) is an outer
    bound nothing on synthetic data may beat, mirroring the opt-in
    reference-profile suite (tests/test_ml_reference_profile.py)."""
    import math

    full = train_and_evaluate(
        spark, sf_dir, model_key, "small", share_cache=True
    ).collect()[0]
    _, test, _, _ = _shared_vectorized_split(spark, sf_dir)
    counts = test.agg(
        F.sum(F.col("label").cast("long")).alias("pos"),
        F.count("*").alias("n"),
    ).collect()[0]
    n_pos = int(counts.pos)
    n_neg = int(counts.n) - n_pos
    n = n_pos + n_neg
    sigma_auc = math.sqrt((n + 1) / (12.0 * n_pos * n_neg))
    auc_lo = 0.5 - 5 * sigma_auc
    auc_hi = min(0.5 + 5 * sigma_auc, 0.84)
    share_lo = min(n_pos, n_neg) / n
    share_hi = max(n_pos, n_neg) / n
    sigma_acc = math.sqrt(0.25 / n)
    acc_lo = share_lo - 5 * sigma_acc
    acc_hi = share_hi + 5 * sigma_acc
    return spark.createDataFrame(
        [
            (
                model_key,
                bool(auc_lo <= full.auc <= auc_hi),
                bool(acc_lo <= full.accuracy <= acc_hi),
            )
        ],
        "model string, auc_in_band boolean, acc_in_band boolean",
    )


# Registry entries run the small-data profile: the driver executes them
# at sf0.01 where the reference iteration counts are all overhead and no
# signal (see models.SMALL_DATA_OVERRIDES). Same classes, same pipeline,
# same band-contract surface; the full-metrics train_and_evaluate
# remains the API default (and what bench/entry users call).
QUERIES = {
    "ml_rf_churn": lambda spark, sf: banded_fit(spark, sf, "rf"),
    "ml_gbt_churn": lambda spark, sf: banded_fit(spark, sf, "gbt"),
    "ml_lr_churn": lambda spark, sf: banded_fit(spark, sf, "lr"),
    "ml_fm_churn": lambda spark, sf: banded_fit(spark, sf, "fm"),
    "ml_feature_vectors": features_vectorized,
}


def _feature_vectors_oracle() -> str:
    """SQL replay of the full feature pipeline's vector layout.

    Slot map (must mirror build_feature_pipeline's VectorAssembler
    input order): continuous columns first, then 0/1 flags, then one
    one-hot block per categorical sized n_distinct + 1 (StringIndexer
    handleInvalid='keep' reserves an __other__ slot that training data
    never sets). Block bases are scalar subqueries over the vocab CTEs
    so the SQL stays correct if the data's category sets change."""
    from ..operators.assembly import ASSEMBLY_ORACLE
    from ..operators.labeling import LABEL_ORACLE

    n_dense = len(dataset.CONTINUOUS) + len(dataset.FLAGS)
    arms = [
        f"SELECT c_custkey, {i} AS slot, CAST({col} AS DOUBLE) AS value"
        f" FROM t WHERE CAST({col} AS DOUBLE) <> 0"
        for i, col in enumerate(dataset.CONTINUOUS)
    ]
    arms += [
        f"SELECT c_custkey, {len(dataset.CONTINUOUS) + j} AS slot,"
        f" CAST(1 AS DOUBLE) AS value FROM t WHERE {col} = 1"
        for j, col in enumerate(dataset.FLAGS)
    ]
    base = str(n_dense)
    vocs = []
    for c in dataset.CATEGORICAL:
        vocs.append(
            f"voc_{c} AS (SELECT {c} AS val,"
            f" row_number() OVER (ORDER BY count(*) DESC, {c}) - 1 AS idx"
            f" FROM t GROUP BY {c})"
        )
        arms.append(
            f"SELECT t.c_custkey, CAST({base} + v.idx AS INTEGER) AS slot,"
            f" CAST(1 AS DOUBLE) AS value"
            f" FROM t JOIN voc_{c} v ON t.{c} = v.val"
        )
        base = f"{base} + (SELECT count(*) + 1 FROM voc_{c})"
    newline = "\nUNION ALL\n"
    return (
        "WITH t AS (\n"
        f"  SELECT a.*, l.label FROM ({ASSEMBLY_ORACLE}) a\n"
        f"  JOIN ({LABEL_ORACLE}) l USING (c_custkey)\n"
        "),\n" + ",\n".join(vocs) + "\n" + newline.join(arms)
    )


# The fits are iterative (not SQL-expressible) but their metric-band
# CONTRACT is: the banded_fit entries assert the bands in-query, so
# the oracle is the trivially-true row — any out-of-band metric flips
# a boolean and hash-mismatches. ml_feature_vectors replays the whole
# vector layout in SQL.
ORACLES: dict[str, str] = {
    "ml_feature_vectors": _feature_vectors_oracle(),
    **{
        f"ml_{key}_churn": (
            f"SELECT '{key}' AS model, true AS auc_in_band,"
            " true AS acc_in_band"
        )
        for key in ("rf", "gbt", "lr", "fm")
    },
}
