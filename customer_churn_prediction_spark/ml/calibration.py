"""Score calibration and feature information-value screening.

Completes the monitoring loop of ``ml/monitoring.py`` (PSI / lift / KS)
with the two remaining standard churn-model reports the reference's
offline evaluation (``RF/randomforest_churn.scala:242-258``) stops
short of:

* **model_calibration** — reliability table: per fixed score band, the
  mean predicted churn probability vs the observed churn rate, the
  per-band gap, expected calibration error (ECE), and the Brier score.
  Lift (``score_band_lift``) answers "does ranking by score target the
  churners"; calibration answers "do the probabilities MEAN anything".
* **feature_iv** — weight-of-evidence / information value per banded
  RFM feature: the classic pre-model screen for which features carry
  churn signal, and the per-band WoE table a scorecard would consume.

Scale design mirrors ``ml/monitoring.py``: one pushed-down scan over
the adjacent feature+label windows, CASE-split conditional aggregation
(no label join), fixed expression bins (no ``ntile`` global sort), and
every window function runs over the tiny per-band aggregate — never
over detail rows. ``feature_iv`` unpivots the three banded features
with ``stack`` BEFORE the aggregate, so the per-customer frame is
scanned once and the only shuffle is the (feature, band) hash
aggregate (≤ 3 features × ≤ 10 bands rows).

Determinism: the score is rounded to 6 dp upstream
(``monitoring._scored_customers``); bands are integer expressions on
literal edges; remaining floats are ratios of integers or of rounded
scores, rounded to 6 dp — the same oracle-hash discipline the
registered monitoring tier ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .monitoring import _SCORED_CTE, _scored_customers

# ------------------------------------------------------------ calibration

_CAL_BANDS = 10


def calibration_frame(scored: DataFrame) -> DataFrame:
    """Reliability table over any (score, label) frame."""
    band = F.least(
        F.floor(F.col("score") * _CAL_BANDS), F.lit(_CAL_BANDS - 1)
    ).cast("int")
    per_band = (
        scored.select(band.alias("band"), "label", "score")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("label").alias("n_churned"),
            F.sum("score").alias("_sum_score"),
            F.sum(
                (F.col("score") - F.col("label"))
                * (F.col("score") - F.col("label"))
            ).alias("_sum_sq_err"),
        )
    )
    w_all = Window.partitionBy()
    avg_score = F.col("_sum_score") / F.col("n_customers")
    churn_rate = F.col("n_churned") / F.col("n_customers")
    gap = avg_score - churn_rate
    n_total = F.sum("n_customers").over(w_all)
    ece = F.sum(F.abs(gap) * F.col("n_customers")).over(w_all) / n_total
    brier = F.sum("_sum_sq_err").over(w_all) / n_total
    return per_band.select(
        "band",
        "n_customers",
        "n_churned",
        F.round(avg_score, 6).alias("avg_score"),
        F.round(churn_rate, 6).alias("churn_rate"),
        F.round(gap, 6).alias("calib_gap"),
        F.round(ece, 6).alias("ece"),
        F.round(brier, 6).alias("brier"),
    ).orderBy("band")


def model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability / calibration report for the deterministic logistic
    churn score (the same score the lift and KS reports grade)."""
    return calibration_frame(_scored_customers(spark, sf_dir))


# ------------------------------------------------------------- feature IV

# Band widths chosen so every band is populated at sf0.01 (recency
# 0..~1095 days over the 3-year feature window; frequency 1..~12;
# monetary ~2e4..~4e6).
_REC_WIDTH = 90
_REC_CAP = 7
_FREQ_CAP = 8
_MON_WIDTH = 500_000.0
_MON_CAP = 7
_IV_EPS = 0.5


def feature_iv_frame(scored: DataFrame) -> DataFrame:
    """WoE / IV over any (recency, frequency, monetary, label) frame.

    Event = churn (label 1), non-event = retained. Laplace smoothing
    (eps per band, eps·n_bands per total) keeps WoE finite on empty
    classes; the smoothing denominator uses the feature's OWN observed
    band count (a window count over the aggregate), so the smoothed
    distributions still sum to 1 within each feature.
    """
    rec_b = F.least(
        F.floor(F.col("recency") / F.lit(_REC_WIDTH)), F.lit(_REC_CAP)
    ).cast("int")
    freq_b = F.least(F.col("frequency"), F.lit(_FREQ_CAP)).cast("int")
    mon_b = F.least(
        F.floor(F.col("monetary") / F.lit(_MON_WIDTH)), F.lit(_MON_CAP)
    ).cast("int")
    unpivoted = scored.select(
        F.expr(
            "stack(3, 'recency', cast({} as int), "
            "'frequency', cast({} as int), "
            "'monetary', cast({} as int)) as (feature, band)".format(
                f"least(floor(recency / {_REC_WIDTH}), {_REC_CAP})",
                f"least(frequency, {_FREQ_CAP})",
                f"least(floor(monetary / {_MON_WIDTH}), {_MON_CAP})",
            )
        ),
        "label",
    )
    # Silence the unused locals warning while documenting the Column
    # forms the stack() string mirrors (stack takes SQL text, and the
    # three band expressions must stay in sync with rec_b/freq_b/mon_b).
    del rec_b, freq_b, mon_b
    per_band = unpivoted.groupBy("feature", "band").agg(
        F.sum("label").alias("n_churned"),
        (F.count(F.lit(1)) - F.sum("label")).alias("n_retained"),
    )
    w_f = Window.partitionBy("feature")
    nb = F.count(F.lit(1)).over(w_f)
    smooth = F.lit(_IV_EPS)
    p_churn = (F.col("n_churned") + smooth) / (
        F.sum("n_churned").over(w_f) + smooth * nb
    )
    p_ret = (F.col("n_retained") + smooth) / (
        F.sum("n_retained").over(w_f) + smooth * nb
    )
    woe = F.log(p_churn / p_ret)
    iv_term = (p_churn - p_ret) * woe
    return per_band.select(
        "feature",
        "band",
        "n_churned",
        "n_retained",
        F.round(woe, 6).alias("woe"),
        F.round(iv_term, 6).alias("iv_term"),
        F.round(F.sum(iv_term).over(w_f), 6).alias("iv_total"),
    ).orderBy("feature", "band")


def feature_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band WoE and per-feature IV of the banded RFM features
    against the churn label."""
    return feature_iv_frame(_scored_customers(spark, sf_dir))


# ---------------------------------------------------------------- oracles

CALIBRATION_ORACLE = f"""
WITH {_SCORED_CTE},
per_band AS (
  SELECT least(CAST(floor(score * {_CAL_BANDS}) AS INT), {_CAL_BANDS - 1}) AS band,
         count(*) AS n_customers,
         CAST(sum(label) AS BIGINT) AS n_churned,
         sum(score) AS _sum_score,
         sum((score - label) * (score - label)) AS _sum_sq_err
  FROM s2 GROUP BY 1
)
SELECT
  band, n_customers, n_churned,
  round(_sum_score / n_customers, 6) AS avg_score,
  round(CAST(n_churned AS DOUBLE) / n_customers, 6) AS churn_rate,
  round(_sum_score / n_customers
        - CAST(n_churned AS DOUBLE) / n_customers, 6) AS calib_gap,
  round(sum(abs(_sum_score / n_customers
                - CAST(n_churned AS DOUBLE) / n_customers) * n_customers)
          OVER () / sum(n_customers) OVER (), 6) AS ece,
  round(sum(_sum_sq_err) OVER () / sum(n_customers) OVER (), 6) AS brier
FROM per_band
ORDER BY band
"""

FEATURE_IV_ORACLE = f"""
WITH {_SCORED_CTE},
unpivoted AS (
  SELECT 'recency' AS feature,
         least(CAST(floor(recency / {_REC_WIDTH}) AS INT), {_REC_CAP}) AS band,
         label
  FROM s2
  UNION ALL
  SELECT 'frequency', least(CAST(frequency AS INT), {_FREQ_CAP}), label FROM s2
  UNION ALL
  SELECT 'monetary',
         least(CAST(floor(monetary / {_MON_WIDTH}) AS INT), {_MON_CAP}), label
  FROM s2
),
per_band AS (
  SELECT feature, band,
         CAST(sum(label) AS BIGINT) AS n_churned,
         CAST(count(*) - sum(label) AS BIGINT) AS n_retained
  FROM unpivoted GROUP BY 1, 2
),
frac AS (
  SELECT *,
    (n_churned + {_IV_EPS}) / (sum(n_churned) OVER (PARTITION BY feature)
        + {_IV_EPS} * count(*) OVER (PARTITION BY feature)) AS p_churn,
    (n_retained + {_IV_EPS}) / (sum(n_retained) OVER (PARTITION BY feature)
        + {_IV_EPS} * count(*) OVER (PARTITION BY feature)) AS p_ret
  FROM per_band
)
SELECT feature, band, n_churned, n_retained,
  round(ln(p_churn / p_ret), 6) AS woe,
  round((p_churn - p_ret) * ln(p_churn / p_ret), 6) AS iv_term,
  round(sum((p_churn - p_ret) * ln(p_churn / p_ret))
          OVER (PARTITION BY feature), 6) AS iv_total
FROM frac
ORDER BY feature, band
"""

# Registered in the r6 rotation; tests/test_calibration.py additionally holds
# these to driver rigor between their PRIORITY windows.
QUERIES = {
    "model_calibration": model_calibration,
    "feature_iv": feature_iv,
}

ORACLES = {
    "model_calibration": CALIBRATION_ORACLE,
    "feature_iv": FEATURE_IV_ORACLE,
}
