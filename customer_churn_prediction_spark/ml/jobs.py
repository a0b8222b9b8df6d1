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


def train_and_evaluate(spark: SparkSession, sf_dir: str, model_key: str) -> DataFrame:
    data = dataset.churn_training_set(spark, sf_dir).cache()
    try:
        train, test = dataset.train_test_split(data)
        estimator = models.MODEL_FACTORIES[model_key]()
        pipe = Pipeline(stages=[*build_feature_pipeline().getStages(), estimator])
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
    assembled vector (as array<double> for inspectability) + label."""
    data = dataset.churn_training_set(spark, sf_dir)
    fitted = build_feature_pipeline().fit(data)
    out = fitted.transform(data)
    return out.select(
        "c_custkey",
        vector_to_array("features").alias("features"),
        F.col("label").cast("int").alias("label"),
    )


QUERIES = {
    "ml_rf_churn": lambda spark, sf: train_and_evaluate(spark, sf, "rf"),
    "ml_gbt_churn": lambda spark, sf: train_and_evaluate(spark, sf, "gbt"),
    "ml_lr_churn": lambda spark, sf: train_and_evaluate(spark, sf, "lr"),
    "ml_fm_churn": lambda spark, sf: train_and_evaluate(spark, sf, "fm"),
    "ml_feature_vectors": features_vectorized,
}

ORACLES: dict[str, str] = {}  # ML fits: rows-only checks by design
