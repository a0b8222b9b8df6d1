"""customer_churn_prediction_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference repo ``xiaogp/customer_churn_prediction`` (a Spark-SQL
RFM feature-engineering + churn-labeling + ML pipeline), re-expressed
idiomatically on Spark DataFrame/SQL + Spark ML and extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, structured streaming).

Layout:
    session      SparkSession factory (AQE, shuffle sizing, UTC)
    catalog      parquet table registry over /root/testdata/<sf>/
    constants    feature/label window dates shared by every operator
    operators/   relational operators (scan/filter/join/agg/window/...)
    functions/   scalar-function surface (dates, rounding, hash, json)
    sources/     readers and writers (parquet/csv/json/libsvm/jdbc)
    ml/          feature pipeline + model factories + evaluation
    text/        dedup (exact/minhash/simhash/jaccard) + text analysis
    similarity/  embedding ANN (brute-force + LSH-bucketed)
    streaming/   event-stream windows (tumbling/sliding/session)
    plans/       query registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
