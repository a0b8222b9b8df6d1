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


def test_sentences_oracle_parity_on_punctuated_docs(spark, tmp_path):
    """The RE2 extraction oracle must agree with the Spark lookbehind
    split on punctuation-heavy inputs (the parquet fixture is
    single-sentence, so this constructed set carries the signal)."""
    import duckdb

    from .oracle_utils import canonical_rows

    docs = [
        (1, "One. Two! Three? Four"),
        (2, "No terminator at all"),
        (3, "Edge!? double terminators. "),
        (4, "  leading space. trailing.  "),
        (5, "..."),
        (6, ""),
        (7, "a.b.c"),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/documents.parquet")

    sdf = U.sentences_exploded(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    odf = con.execute(U.ORACLES["text_sentences"]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canonical_rows(sdf) == canonical_rows(odf)
