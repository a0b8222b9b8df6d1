"""J3 three-form equivalence (permanent equality pytest).

The reference's label join (``RF/randomforest_churn.scala:212-227``)
is an outer join + na.fill(1); Spark's native ``left_anti`` /
``left_semi`` forms are the same predicate. ``label_churned_anti``
retired from the registry in r8 (its slot registered
``text_tokenize_bpe``) and ``label_retained_semi`` retired in r6 —
this test is the standing proof that the registered ``label_churn``
row covers all three forms, so neither retirement loses driver
evidence (registry.RETIRED contract).
"""

from customer_churn_prediction_spark.operators import labeling


def _keys(df):
    return sorted(r.c_custkey for r in df.select("c_custkey").collect())


def test_anti_and_semi_partition_the_outer_join(spark, sf_dir):
    labeled = labeling.label_churn(spark, sf_dir).collect()
    churned = sorted(r.c_custkey for r in labeled if r.label == 1)
    retained = sorted(r.c_custkey for r in labeled if r.label == 0)

    anti = _keys(labeling.churned_anti(spark, sf_dir))
    semi = _keys(labeling.retained_semi(spark, sf_dir))

    assert anti == churned
    assert semi == retained
    # the two native forms partition the active set exactly
    assert len(anti) + len(semi) == len(labeled)
    assert not set(anti) & set(semi)
    # and both sides are non-trivial at the test SF (a vacuous split
    # would make the equivalence proof meaningless)
    assert anti and semi
