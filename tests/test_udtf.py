"""Python UDTF (table function) surface: LATERAL expansion works and
agrees with the expression-only posexplode form on sentence text."""

from customer_churn_prediction_spark.functions import udtf as U


def test_udtf_lateral_matches_expression_form(spark, sf_smoke):
    a = U.sentences_udtf(spark, sf_smoke).toPandas()
    b = U.sentences_exploded(spark, sf_smoke).toPandas()
    assert len(a) == len(b) > 0
    key = lambda df: sorted(zip(df.doc_id, df.pos, df.sentence, df.n_chars))
    assert key(a) == key(b)


def test_udtf_sql_scalar_call(spark):
    U.register(spark)
    rows = spark.sql(
        "SELECT * FROM sentence_split('One. Two! Three')"
    ).collect()
    assert [r.sentence for r in rows] == ["One.", "Two!", "Three"]
    assert [r.pos for r in rows] == [0, 1, 2]
