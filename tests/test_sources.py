"""Sink/source round-trips (SURVEY §5.3): libsvm codec round-trip,
salted keyed export, managed-table write, csv/json readers, batch
scoring output."""

import json

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.ml import dataset, pipeline
from customer_churn_prediction_spark.sources import readers, writers


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(p)
    back = readers.read_csv(spark, p)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in src.collect()
    )


def test_json_records_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    p = str(tmp_path / "region_json")
    src.write.json(p)
    back = readers.read_json_records(spark, p)
    assert back.count() == src.count()


def test_libsvm_roundtrip(spark, sf_dir, tmp_path):
    """CSV -> fitted one-hot pipeline -> libsvm text -> format('libsvm')
    reader -> identical vectors (the reference's golden-pair check,
    LR/data/churn_train_sample.csv vs .svm)."""
    data = dataset.churn_training_set(spark, sf_dir).limit(200)
    fitted = pipeline.build_feature_pipeline().fit(data)
    vec = fitted.transform(data).select("label", "features")
    width = vec.head().features.size

    lines = writers.to_libsvm_lines(vec)
    p = str(tmp_path / "churn_svm")
    lines.coalesce(1).write.mode("overwrite").text(p)

    back = readers.read_libsvm(spark, p, num_features=width)
    orig = sorted(
        (float(r.label), tuple(round(x, 6) for x in r.features.toArray()))
        for r in vec.collect()
    )
    rt = sorted(
        (float(r.label), tuple(round(x, 6) for x in r.features.toArray()))
        for r in back.collect()
    )
    assert rt == orig


def test_salted_keyed_export(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    p = str(tmp_path / "salted")
    writers.salted_keyed_export(src, "c_custkey", p, n_buckets=8)
    back = spark.read.parquet(p)
    assert back.count() == src.count()
    assert back.select("salt_bucket").distinct().count() == 8
    row = back.where(F.col("c_custkey") == 1).head()
    assert row.row_key.endswith("_1") and len(row.row_key.split("_")[0]) == 4


def test_save_as_table(spark, sf_dir):
    writers.save_as_table(
        load_table(spark, sf_dir, "region"), "region_managed"
    )
    assert spark.table("region_managed").count() == 5
    spark.sql("DROP TABLE region_managed")


def test_batch_score_to_json(spark, sf_dir):
    from pyspark.ml import Pipeline

    from customer_churn_prediction_spark.ml import models

    data = dataset.churn_training_set(spark, sf_dir)
    pipe = Pipeline(
        stages=[*pipeline.build_feature_pipeline().getStages(),
                models.logistic_regression()]
    )
    fitted = pipe.fit(data)
    out = writers.batch_score_to_json(fitted, data.limit(5), "c_custkey")
    rows = [json.loads(r.response) for r in out.collect()]
    assert len(rows) == 5
    assert all({"c_custkey", "prediction", "p1"} <= set(r) for r in rows)


def test_date_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    """Partition pruning evidence: a date predicate over the
    partitioned layout shows up as PartitionFilters in the physical
    plan and reads only the matching day directories."""
    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_by_day")
    writers.write_date_partitioned(events, "ts", path)
    back = spark.read.parquet(path)
    one_day = back.select("dt").distinct().limit(1).collect()[0][0]
    q = back.where(F.col("dt") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dt" in plan
    # Row parity with the unpartitioned filter on the same day.
    want = events.where(F.to_date("ts") == F.lit(one_day)).count()
    assert q.count() == want


def test_bucketed_join_no_shuffle(spark, sf_smoke):
    """Co-located join: both sides bucketed by the key -> the equi-join
    plan contains no Exchange (the shuffle was paid once at write)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            warehouse.removeprefix("file:") + f"/{t}", ignore_errors=True
        )
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    writers.write_bucketed(orders, "o_orderkey", "orders_bkt", 8)
    writers.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey", "lineitem_bkt", 8,
    )
    a = spark.table("orders_bkt")
    b = spark.table("lineitem_bkt")
    joined = a.join(b, "o_orderkey")
    # At smoke scale the planner would just broadcast the small side
    # (also shuffle-free, but not what we're proving); disable it so
    # the plan shows the bucketed sort-merge join a 100 TB join uses.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_jdbc_sink_roundtrip_embedded_derby(spark, sf_smoke, tmp_path):
    """S10 executed for real: write through write_jdbc into an embedded
    Derby database (driver jar ships in Spark's classpath), read back
    via spark.read.jdbc, compare rows. Same call shape as the
    reference's MySQL sink (GBDT/spark/utils.scala:109-116)."""
    url = f"jdbc:derby:{tmp_path}/churn_db;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    out = (
        load_table(spark, sf_smoke, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .limit(50)
    )
    writers.write_jdbc(out, url, "churn_scores", mode="overwrite",
                       properties=props)
    back = spark.read.jdbc(url, "churn_scores", properties=props)
    assert back.count() == 50
    assert sorted(back.columns) == sorted(out.columns)
    a = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
