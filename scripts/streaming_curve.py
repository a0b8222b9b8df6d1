"""Scale-curve the maintenance streams at the x10 decade.

The r7 streaming twins (`streaming/sketch.py::maintain_heavy_hitters`,
`streaming/pairs.py::streaming_sequence_pairs`,
`streaming/vector_drift.py::maintain_embedding_drift`) carry
batch-equivalence and crash-replay tests, but their 100 TB risk
surface is per-EPOCH behavior: how does one micro-batch's wall time
and the maintained state/store size grow with ingest volume? This
script measures exactly that — each twin ingests its fixture in 3
pre-staged waves (staging is untimed), and each
``processAllAvailable()`` is timed per wave at the base fixture and
its x10 replica (`scripts/make_events_x10.py` /
`make_embeddings_x10.py` outputs in ``.scale/``).

Prints one markdown table (per-epoch medians are meaningless at 3
epochs, so per-epoch walls are listed raw) plus the state-size
columns that bound each twin's growth: the CMS store adds <= d*w rows
per epoch regardless of keys; the pairs state is one bounded row per
user; the drift report is N_CENTROIDS rows per epoch, constant.

Usage: python scripts/streaming_curve.py   (run ALONE — bench rule)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
X10_EVENTS = os.path.join(REPO, ".scale", "sf1events")
X10_EMB = os.path.join(REPO, ".scale", "sf1emb")
N_WAVES = 3


def _stage_waves(df, order_col, wave_dir_base):
    """Split ``df`` into N_WAVES ts/id-range slices, each staged as its
    own parquet dir (drops are dir-to-dir file copies, untimed)."""
    cuts = df.approxQuantile(
        order_col, [i / N_WAVES for i in range(1, N_WAVES)], 0.001
    )
    from pyspark.sql import functions as F

    dirs = []
    lo = None
    for i in range(N_WAVES):
        hi = cuts[i] if i < len(cuts) else None
        part = df
        if lo is not None:
            part = part.where(F.col(order_col) > F.lit(lo))
        if hi is not None:
            part = part.where(F.col(order_col) <= F.lit(hi))
        d = f"{wave_dir_base}_w{i}"
        part.repartition(4).write.mode("overwrite").parquet(d)
        dirs.append(d)
        lo = hi
    return dirs


def _drop(wave_dir, drop_dir, i):
    for j, f in enumerate(sorted(os.listdir(wave_dir))):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(wave_dir, f),
                os.path.join(drop_dir, f"w{i}_{j}.parquet"),
            )


def _run_epochs(q, wave_dirs, drop_dir):
    """Drop each staged wave and time its processAllAvailable()."""
    walls = []
    try:
        for i, wd in enumerate(wave_dirs):
            _drop(wd, drop_dir, i)
            t0 = time.perf_counter()
            q.processAllAvailable()
            walls.append(round(time.perf_counter() - t0, 3))
        assert q.exception() is None, q.exception()
    finally:
        q.stop()
    return walls


def bench_sketch(spark, sf_dir, tag):
    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import sketch as ssk
    from customer_churn_prediction_spark.streaming import windows as sw

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"cms_{tag}_")
    waves = _stage_waves(events, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    q = ssk.maintain_heavy_hitters(
        spark, sw.as_stream(spark, drop_dir, events.schema), store,
        checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    store_rows = spark.read.parquet(
        os.path.join(store, ssk.SKETCH_SUBDIR)
    ).count()
    n_users = events.select("user_id").distinct().count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{store_rows} sketch rows ({n_users} keys)"


def bench_pairs(spark, sf_dir, tag):
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import pairs as sp
    from customer_churn_prediction_spark.streaming import windows as sw

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"pairs_{tag}_")
    # ts-range waves: per-user arrival order == batch window order
    waves = _stage_waves(
        events.withColumn("ts_l", events.ts.cast("long")), "ts_l",
        os.path.join(work, "wave"),
    )
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    out = os.path.join(work, "out")

    def land(df, epoch_id):
        df.write.mode("append").parquet(out)

    schema = spark.read.parquet(waves[0]).schema
    q = (
        sp.streaming_sequence_pairs(
            sw.as_stream(spark, drop_dir, schema)
        )
        .writeStream.foreachBatch(land)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .queryName(f"pairs_curve_{tag}")
        .start()
    )
    walls = _run_epochs(q, waves, drop_dir)
    n_pairs = spark.read.parquet(out).count()
    n_users = events.select("user_id").distinct().count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n_pairs} pairs ({n_users} user-state rows)"


def bench_hll(spark, sf_dir, tag):
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import hll as shll
    from customer_churn_prediction_spark.streaming import windows as sw

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"hll_{tag}_")
    waves = _stage_waves(events, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    q = shll.maintain_distinct_count(
        spark, sw.as_stream(spark, drop_dir, events.schema), store,
        checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    n_regs = spark.read.parquet(
        os.path.join(store, shll.REGS_SUBDIR)
    ).count()
    n_users = events.select("user_id").distinct().count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n_regs} register rows ({n_users} keys)"


def bench_kmv(spark, sf_dir, tag):
    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import kmv as skmv
    from customer_churn_prediction_spark.streaming import windows as sw

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"kmv_{tag}_")
    waves = _stage_waves(events, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    # day granularity: the events fixture spans ~a month, so months
    # would collapse to one group — days give ~30 real sketch groups
    stream = sw.as_stream(spark, drop_dir, events.schema).select(
        F.date_trunc("day", F.col("ts"))
        .cast("date").cast("string").alias("grp"),
        F.col("user_id").cast("string").alias("key"),
    )
    q = skmv.maintain_group_sketches(
        spark, stream, store, checkpoint=os.path.join(work, "ckpt")
    )
    walls = _run_epochs(q, waves, drop_dir)
    stored = spark.read.parquet(
        os.path.join(store, skmv.SKETCH_SUBDIR)
    ).count()
    merged = skmv.merged_sketch(spark, store).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{stored} stored rows, {merged} merged (<=K/grp)"


def bench_selection(spark, sf_dir, tag):
    """DSIR-on-ingest: model FROZEN from the fixture corpus (untimed
    — the once-per-refresh fit), then each epoch scores only its own
    drop against the broadcast model."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        selection as ssel,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    model = ssel.freeze_model(docs)  # untimed: offline refresh
    work = tempfile.mkdtemp(prefix=f"dsir_{tag}_")
    waves = _stage_waves(docs, "doc_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    stream = spark.readStream.schema(
        "doc_id bigint, lang string, text string"
    ).parquet(drop_dir)
    q = ssel.select_ingest_stream(
        spark, stream, model, store,
        checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    scored = ssel.read_scored(spark, store)
    n, n_sel = scored.count(), scored.where("selected").count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n} scored, {n_sel} selected; model {len(model['deltas'])} rows"


def bench_quantiles(spark, sf_dir, tag):
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        quantiles as sq,
    )
    from customer_churn_prediction_spark.streaming import windows as sw
    from customer_churn_prediction_spark.streaming.drift import (
        read_report,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"quant_{tag}_")
    waves = _stage_waves(events, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    report = os.path.join(work, "report")
    q = sq.maintain_quantiles(
        spark, sw.as_stream(spark, drop_dir, events.schema), report,
        checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    n_rows = read_report(spark, report).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n_rows} report rows/epoch (GK buffer per group)"


def bench_bloom(spark, sf_dir, tag):
    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import bloom as sbl
    from customer_churn_prediction_spark.streaming import windows as sw

    events = load_table(spark, sf_dir, "events")
    keys = events.select(
        "event_id", F.col("user_id").cast("string").alias("key")
    )
    work = tempfile.mkdtemp(prefix=f"bloom_{tag}_")
    waves = _stage_waves(keys, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    schema = spark.read.parquet(waves[0]).schema
    q = sbl.maintain_membership(
        spark, sw.as_stream(spark, drop_dir, schema), store,
        checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    # raw STORED rows (like the CMS/HLL rows), not the deduped merge:
    # the at-rest store grows with epoch count until compact folds it
    n_stored = spark.read.parquet(
        os.path.join(store, sbl.BITS_SUBDIR)
    ).count()
    n_bits = sbl.merged_bits(spark, store).count()
    n_users = events.select("user_id").distinct().count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, (
        f"{n_stored} stored bit rows ({n_bits} distinct, "
        f"{n_users} keys)"
    )


def bench_ann_ingest(spark, sf_dir, tag):
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        ann_ingest as sai,
    )
    from customer_churn_prediction_spark.streaming import windows as sw

    emb = load_table(spark, sf_dir, "embeddings")
    work = tempfile.mkdtemp(prefix=f"annin_{tag}_")
    waves = _stage_waves(emb, "vec_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    q = sai.maintain_ivf_lists(
        spark, sf_dir, sw.as_stream(spark, drop_dir, emb.schema), store,
        checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    n_rows = spark.read.parquet(store).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n_rows} indexed vectors (1 row/vector)"


def bench_vector_drift(spark, sf_dir, tag):
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        vector_drift as vd,
    )
    from customer_churn_prediction_spark.streaming.drift import (
        read_report,
    )
    from customer_churn_prediction_spark.streaming import windows as sw

    emb = load_table(spark, sf_dir, "embeddings")
    work = tempfile.mkdtemp(prefix=f"vdrift_{tag}_")
    waves = _stage_waves(emb, "vec_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    report = os.path.join(work, "report")
    q = vd.maintain_embedding_drift(
        spark, sf_dir, sw.as_stream(spark, drop_dir, emb.schema),
        report, checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    rep_rows = read_report(spark, report).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{rep_rows} report rows/epoch"


def bench_text_drift(spark, sf_dir, tag):
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        text_drift as td,
    )
    from customer_churn_prediction_spark.streaming import windows as sw
    from customer_churn_prediction_spark.streaming.drift import (
        read_report,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    work = tempfile.mkdtemp(prefix=f"tdrift_{tag}_")
    waves = _stage_waves(docs, "doc_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    report = os.path.join(work, "report")
    q = td.maintain_text_drift(
        spark, sf_dir, sw.as_stream(spark, drop_dir, docs.schema),
        report, checkpoint=os.path.join(work, "ckpt"),
    )
    walls = _run_epochs(q, waves, drop_dir)
    rep_rows = read_report(spark, report).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{rep_rows} report rows/epoch (<= TEXT_DRIFT_B)"


def bench_fragment_ingest(spark, sf_dir, tag):
    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        fragment_ingest as fin,
    )
    from customer_churn_prediction_spark.text import dedup

    docs = load_table(spark, sf_dir, "documents")
    new = docs.where(
        (F.col("doc_id") % dedup.INCREMENTAL_MOD)
        >= dedup.INCREMENTAL_NEW_RESIDUE
    )
    work = tempfile.mkdtemp(prefix=f"fragin_{tag}_")
    waves = _stage_waves(new, "doc_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    out = os.path.join(work, "out")
    # store/df-snapshot builds happen here, BEFORE epoch timing —
    # the once-per-crawl-cycle cost, not the per-drop cost
    q = fin.fragment_ingest_stream(
        spark, sf_dir, drop_dir, out,
        checkpoint=os.path.join(work, "ckpt"),
        query_name=f"fragment_curve_{tag}",
        available_now=False,
    )
    walls = _run_epochs(q, waves, drop_dir)
    n_covered = spark.read.parquet(out).count()
    n_new = new.count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n_covered} covered of {n_new} drops"


def bench_resample(spark, sf_dir, tag):
    """Hourly feature-grid rollup on ingest (the matrix's seventh
    family): each epoch lands its own (user, hour) partials — state
    linear in the epoch's events, independent of history — and the
    snapshot republishes one bounded row per user."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        resample as srs,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"resample_{tag}_")
    waves = _stage_waves(events, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    stream = spark.readStream.schema(events.schema).parquet(drop_dir)
    q = srs.maintain_resample(
        spark, stream, store, checkpoint=os.path.join(work, "ckpt")
    )
    walls = _run_epochs(q, waves, drop_dir)
    stored = spark.read.parquet(
        os.path.join(store, srs.STATE_SUBDIR)
    ).count()
    grid = srs.resample_report(spark, store).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{stored} (user,hour) partials; served grid {grid} rows"


def bench_decay(spark, sf_dir, tag):
    """Decayed counters on ingest (the matrix's eighth family): each
    epoch rescales the previous per-user snapshot by one shared
    factor and adds its own contribution — state is one row per user,
    constant in history."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import decay as sdc

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"decay_{tag}_")
    waves = _stage_waves(events, "event_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    stream = spark.readStream.schema(events.schema).parquet(drop_dir)
    q = sdc.maintain_decay(
        spark, stream, store, checkpoint=os.path.join(work, "ckpt")
    )
    walls = _run_epochs(q, waves, drop_dir)
    n_users = sdc.latest_state(spark, store).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n_users} user rows/snapshot"


def bench_sample(spark, sf_dir, tag):
    """A-ES weighted reservoir on ingest (the matrix's ninth family):
    each epoch lands its own <= K keyed rows — state sketch-sized,
    constant in corpus size."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import (
        sample as ssam,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    work = tempfile.mkdtemp(prefix=f"sample_{tag}_")
    waves = _stage_waves(docs, "doc_id", os.path.join(work, "wave"))
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    stream = spark.readStream.schema(
        "doc_id bigint, lang string, n_chars bigint"
    ).parquet(drop_dir)
    q = ssam.maintain_sample(
        spark, stream, store, checkpoint=os.path.join(work, "ckpt")
    )
    walls = _run_epochs(q, waves, drop_dir)
    n = ssam.current_sample(spark, store).count()
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"{n}-row reservoir"


def bench_decay_touched(spark, sf_dir, tag):
    """The r11 delta-write claim, isolated: epoch wall must track the
    epoch's TOUCHED users, not the store's population. The r10 curve
    split waves by event_id, so every wave touched ~every user and
    the full-snapshot rewrite term was invisible (VERDICT r10 item
    4). Here wave 0 ingests the WHOLE population (builds a big
    store), then two small waves each touch only a ~5% disjoint
    user slice — under the old eager-rewrite design their walls
    would match wave 0's (full snapshot through one task every
    epoch); under delta writes they collapse toward the slice
    size."""
    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.streaming import decay as sdc

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix=f"decaytouch_{tag}_")
    slice1 = F.col("user_id") % 20 == 0
    slice2 = F.col("user_id") % 20 == 1
    waves = []
    for i, part in enumerate(
        [
            events.where(~slice1 & ~slice2),
            events.where(slice1),
            events.where(slice2),
        ]
    ):
        d = os.path.join(work, f"wave_w{i}")
        part.repartition(4).write.mode("overwrite").parquet(d)
        waves.append(d)
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)
    store = os.path.join(work, "store")
    stream = spark.readStream.schema(events.schema).parquet(drop_dir)
    q = sdc.maintain_decay(
        spark, stream, store, checkpoint=os.path.join(work, "ckpt")
    )
    walls = _run_epochs(q, waves, drop_dir)
    touched = [
        spark.read.parquet(w)
        .select("user_id").distinct().count()
        for w in waves
    ]
    shutil.rmtree(work, ignore_errors=True)
    return walls, f"touched users/epoch {touched}"


def main() -> None:
    from customer_churn_prediction_spark.session import get_spark

    spark = get_spark(
        app_name="streaming-curve", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    plans = [
        ("maintain_heavy_hitters", bench_sketch, SF01, X10_EVENTS),
        ("streaming_sequence_pairs", bench_pairs, SF01, X10_EVENTS),
        ("maintain_embedding_drift", bench_vector_drift, SF01, X10_EMB),
        ("maintain_ivf_lists", bench_ann_ingest, SF01, X10_EMB),
        ("maintain_distinct_count", bench_hll, SF01, X10_EVENTS),
        ("maintain_membership", bench_bloom, SF01, X10_EVENTS),
        ("maintain_quantiles", bench_quantiles, SF01, X10_EVENTS),
        ("maintain_group_sketches", bench_kmv, SF01, X10_EVENTS),
        ("maintain_resample", bench_resample, SF01, X10_EVENTS),
        ("maintain_decay", bench_decay, SF01, X10_EVENTS),
        ("maintain_decay_touched", bench_decay_touched, SF01,
         X10_EVENTS),
        ("maintain_sample", bench_sample, SF01,
         os.path.join(REPO, ".scale", "sf1docs")),
        ("select_ingest_stream", bench_selection, SF01,
         os.path.join(REPO, ".scale", "sf1docs")),
        ("maintain_text_drift", bench_text_drift, SF01,
         os.path.join(REPO, ".scale", "sf1docs")),
        ("fragment_ingest", bench_fragment_ingest, SF01,
         os.path.join(REPO, ".scale", "sf1docs")),
    ]
    print("| twin | per-epoch walls sf0.1 (s) | per-epoch walls x10 (s) "
          "| last-epoch growth | state (x10) |")
    print("|---|---|---|---|---|")
    for name, fn, base_dir, x10_dir in plans:
        fn(spark, "/root/testdata/sf0.001", "warm")  # untimed: the
        # first foreachBatch epoch of a fresh query pays JVM/codegen
        # warmup that would otherwise inflate the base column only
        base_walls, _ = fn(spark, base_dir, "base")
        if not os.path.isdir(x10_dir):
            print(f"| {name} | {base_walls} | x10 fixture missing | | |")
            continue
        x10_walls, state = fn(spark, x10_dir, "x10")
        # walls are rounded to 3 decimals — a sub-millisecond base
        # epoch would round to 0.0 and kill the rest of the curve run
        # with ZeroDivisionError (ADVICE r8)
        growth = round(x10_walls[-1] / max(base_walls[-1], 1e-3), 2)
        print(f"| {name} | {base_walls} | {x10_walls} "
              f"| {growth}x | {state} |")
    spark.stop()


if __name__ == "__main__":
    main()
