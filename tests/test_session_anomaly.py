"""session_anomaly (operators/sessions.py, staged r12): per-visit
mean-NLL scoring under the session transition model — oracle parity
plus the semantics the score exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sessions

from .oracle_utils import assert_matches_oracle


def test_anomaly_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sessions.session_anomaly(spark, sf_dir),
        sessions.STAGED_ORACLES["session_anomaly"],
        sf_dir,
    )


def test_rare_transition_scores_above_common_one(spark, tmp_path):
    """The point of the score: a visit made of a RARE transition must
    outrank visits made of the dominant one. Constructed log: 9 users
    do add->buy (p=0.9), one does add->refund (p=0.1); the refund
    visit's mean_nll must be strictly higher, and single-event visits
    emit nothing."""
    rows = []
    for u in range(9):
        rows.append((u * 10 + 1, f"2024-01-01 0{u}:00:00", u, "add"))
        rows.append((u * 10 + 2, f"2024-01-01 0{u}:00:10", u, "buy"))
    rows.append((91, "2024-01-01 09:00:00", 9, "add"))
    rows.append((92, "2024-01-01 09:00:10", 9, "refund"))
    rows.append((100, "2024-01-01 10:00:00", 10, "add"))  # lone event
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")

    # widen the op's event window? No: the constructed ts are inside
    # the fixture's 2024 range only if EVENTS_START allows; compute on
    # frames directly via the module internals instead.
    from customer_churn_prediction_spark.operators.sessions import (
        _session_numbered,
        transitions_from_events,
    )
    from pyspark.sql import Window

    e = df.select("user_id", "ts", "event_id", "event_type")
    model = transitions_from_events(e).select(
        "from_type", "to_type", "p"
    )
    numbered = _session_numbered(e, ["event_type"])
    w_s = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    pairs = numbered.select(
        "user_id", "session_seq",
        F.lag("event_type").over(w_s).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    scored = (
        pairs.join(F.broadcast(model), ["from_type", "to_type"])
        .groupBy("user_id", "session_seq")
        .agg(F.round(F.avg(-F.log("p")), 6).alias("mean_nll"))
    )
    out = {r.user_id: r.mean_nll for r in scored.collect()}
    assert 10 not in out                     # lone event: no score
    assert out[9] > out[0]                   # rare beats common
    assert all(out[u] == out[0] for u in range(1, 9))


def test_every_scored_visit_is_a_session_with_transitions(spark, sf_dir):
    """Row identity: scored visits = event_sessions rows with
    n_events >= 2 (a visit with one event has no transitions), and
    nll_sum/mean_nll are consistent."""
    scores = sessions.session_anomaly(spark, sf_dir)
    visits = sessions.event_sessions(spark, sf_dir)
    v2 = visits.where(F.col("n_events") >= 2).select(
        "user_id", "session_seq"
    )
    got = {
        (r.user_id, r.session_seq) for r in scores.collect()
    }
    want = {(r.user_id, r.session_seq) for r in v2.collect()}
    assert got == want and got
    for r in scores.collect():
        assert r.n_transitions >= 1
        assert r.nll_sum >= 0.0
        # Python's round() is banker's; Spark/DuckDB round half away
        # from zero (a .xxxxxx5 quotient differs in the last digit) —
        # compare within half an ulp of the 6dp grid instead.
        assert abs(
            r.mean_nll - r.nll_sum / r.n_transitions
        ) <= 5e-7 + 1e-9


def test_store_served_scores_equal_inline(spark, sf_smoke, tmp_path):
    """The maintained-store serve path: ingest the op's own event
    window into the transitions store (sliced mid-session by
    event_id % 3), then visit_anomaly_report against the maintained
    model must equal the inline session_anomaly (which refits per
    call) row-for-row."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.constants import (
        EVENTS_END_EXCL,
        EVENTS_START,
    )
    from customer_churn_prediction_spark.streaming import (
        transitions as stt,
    )

    e = load_table(spark, sf_smoke, "events").where(
        (F.col("ts") >= F.lit(EVENTS_START).cast("timestamp"))
        & (F.col("ts") < F.lit(EVENTS_END_EXCL).cast("timestamp"))
    )
    stream_dir = str(tmp_path / "arrivals")
    for i in range(3):
        e.where(F.col("event_id") % 3 == i).repartition(1).write.mode(
            "append"
        ).parquet(stream_dir)
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = stt.maintain_transitions(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    served = sorted(
        map(
            tuple,
            stt.visit_anomaly_report(spark, store, e).collect(),
        )
    )
    inline = sorted(
        map(tuple, sessions.session_anomaly(spark, sf_smoke).collect())
    )
    assert served == inline and served
    # superset ingest: partial-coverage machinery must be inert
    assert all(r[3] == 0 for r in served)  # n_unseen


def _events_df(spark, rows):
    from pyspark.sql import functions as F2

    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).select(
        "user_id",
        F2.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
    )


def test_unseen_transitions_score_backoff_not_silent_subset(
    spark, tmp_path
):
    """r13 (VERDICT r12 #3): score events the store has NOT ingested.
    The store learns only add->buy; a scored visit doing add->refund
    must earn the explicit stupid-backoff floor (-log(P_FLOOR)) with
    n_unseen=1 — NOT a silently shrunken n_transitions/mean over the
    known subset."""
    import math

    from customer_churn_prediction_spark.operators.sessions import P_FLOOR
    from customer_churn_prediction_spark.streaming import (
        transitions as stt,
    )

    known = []
    for u in range(9):
        known.append((u * 10 + 1, f"2024-01-01 0{u}:00:00", u, "add"))
        known.append((u * 10 + 2, f"2024-01-01 0{u}:00:10", u, "buy"))
    novel = [
        (91, "2024-01-01 09:00:00", 9, "add"),
        (92, "2024-01-01 09:00:10", 9, "refund"),
    ]
    ingest = _events_df(spark, known)
    stream_dir = str(tmp_path / "arrivals")
    ingest.repartition(1).write.mode("append").parquet(stream_dir)
    store = str(tmp_path / "store")
    stream = spark.readStream.schema(ingest.schema).parquet(stream_dir)
    q = stt.maintain_transitions(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    out = {
        r.user_id: r
        for r in stt.visit_anomaly_report(
            spark, store, _events_df(spark, known + novel)
        ).collect()
    }
    floor_nll = round(-math.log(P_FLOOR), 6)
    r9 = out[9]
    assert (r9.n_transitions, r9.n_unseen) == (1, 1)
    assert r9.nll_sum == floor_nll and r9.mean_nll == floor_nll
    for u in range(9):  # fully-covered visits: p=1.0, zero NLL
        assert (out[u].n_transitions, out[u].n_unseen) == (1, 0)
        assert out[u].mean_nll == 0.0


def test_rounded_to_zero_p_floors_in_both_engines(spark, tmp_path):
    """r13 (ADVICE r12, medium): a transition with n/n_from < 5e-7
    rounds its 6dp model p to exactly 0.0. Pre-floor, Spark log(0)
    answered NULL (silent drop from nll_sum) and DuckDB ln(0) raised
    OutOfRangeException. With the P_FLOOR in both engines the scores
    are total and identical. Corpus: one user, 2,000,000 a->a
    transitions and ONE a->b, so n_from(a)=2,000,001 and
    p(a->b)=1/2,000,001 -> 0.0 at 6dp."""
    import math

    import duckdb
    from pyspark.sql import functions as F2

    from customer_churn_prediction_spark.operators.sessions import (
        ANOMALY_ORACLE,
        P_FLOOR,
        score_visits_against,
        transitions_from_events,
    )

    n_aa = 2_000_000
    e = (
        spark.range(n_aa + 2)
        .select(
            F2.lit(1).cast("long").alias("user_id"),
            F2.lit("2024-01-05 00:00:00")
            .cast("timestamp")
            .alias("ts"),
            F2.col("id").alias("event_id"),
            F2.when(F2.col("id") == n_aa + 1, F2.lit("b"))
            .otherwise(F2.lit("a"))
            .alias("event_type"),
        )
    )
    model = transitions_from_events(e)
    p_rare = model.where(F2.col("to_type") == "b").collect()[0].p
    assert p_rare == 0.0  # the trap is actually constructed

    got = score_visits_against(
        e, model.select("from_type", "to_type", "p")
    ).collect()
    assert len(got) == 1
    row = got[0]
    floor_nll = round(-math.log(P_FLOOR), 6)
    assert row.n_transitions == n_aa + 1
    assert row.n_unseen == 0  # seen, just rounded to zero
    assert row.nll_sum == floor_nll  # 2M p=1.0 zeros + one floor
    assert row.mean_nll == round(floor_nll / (n_aa + 1), 6)

    # the oracle on the same corpus must not raise and must agree
    path = str(tmp_path / "events.parquet")
    e.repartition(4).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    odf = con.execute(ANOMALY_ORACLE).df()
    assert len(odf) == 1
    orow = odf.iloc[0]
    assert int(orow.n_transitions) == row.n_transitions
    assert int(orow.n_unseen) == row.n_unseen
    assert float(orow.nll_sum) == row.nll_sum
    assert float(orow.mean_nll) == row.mean_nll
