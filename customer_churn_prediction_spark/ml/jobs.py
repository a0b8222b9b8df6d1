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

# Cached (sized training frame, row count) per (session, sf_dir), shared
# by the four registry model jobs so features ⋈ label is computed once,
# not four times. Only the registry path opts in (share_cache=True); the
# default API path keeps its own cache + unpersist lifecycle.
_SHARED_TRAINING: dict[tuple[int, str], tuple[DataFrame, int]] = {}


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
    key = (id(spark), sf_dir)
    hit = _SHARED_TRAINING.get(key)
    if hit is None:
        data = dataset.churn_training_set(spark, sf_dir).cache()
        n_rows = data.count()
        hit = (_sized(data, n_rows), n_rows)
        _SHARED_TRAINING[key] = hit
    return hit


# (fitted-feature train, test, n_train, n_test) per (session, sf_dir):
# the four registry model jobs share one feature-pipeline fit and one
# pair of cached vectorized splits — the standard fit-features-once,
# sweep-estimators pattern. Results are bit-identical to fitting the
# composed Pipeline per job (the feature stages fit on the same train
# split either way).
_SHARED_VECTORIZED: dict[tuple[int, str], tuple] = {}


def _shared_vectorized_split(spark: SparkSession, sf_dir: str) -> tuple:
    key = (id(spark), sf_dir)
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
    """The fitted feature pipeline's output surface: per customer the
    assembled vector (as array<double> for inspectability) + label.
    Shares the registry's cached training frame with the model jobs."""
    data, _ = _shared_training_set(spark, sf_dir)
    fitted = build_feature_pipeline().fit(data)
    out = fitted.transform(data)
    return out.select(
        "c_custkey",
        vector_to_array("features").alias("features"),
        F.col("label").cast("int").alias("label"),
    )


# Registry entries run the small-data profile: the driver executes them
# at sf0.01 where the reference iteration counts are all overhead and no
# signal (see models.SMALL_DATA_OVERRIDES). Same classes, same pipeline,
# same metrics surface; the reference profile remains the API default.
QUERIES = {
    "ml_rf_churn": lambda spark, sf: train_and_evaluate(
        spark, sf, "rf", "small", share_cache=True),
    "ml_gbt_churn": lambda spark, sf: train_and_evaluate(
        spark, sf, "gbt", "small", share_cache=True),
    "ml_lr_churn": lambda spark, sf: train_and_evaluate(
        spark, sf, "lr", "small", share_cache=True),
    "ml_fm_churn": lambda spark, sf: train_and_evaluate(
        spark, sf, "fm", "small", share_cache=True),
    "ml_feature_vectors": features_vectorized,
}

ORACLES: dict[str, str] = {}  # ML fits: rows-only checks by design
