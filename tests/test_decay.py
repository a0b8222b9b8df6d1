"""user_decay_features (operators/decay.py, staged r10): half-life
decayed engagement — oracle parity plus the decay semantics on a
constructed event history where the right answer is arithmetic."""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import decay

from .oracle_utils import assert_matches_oracle


def test_decay_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        decay.user_decay_features(spark, sf_dir),
        decay.ORACLES["user_decay_features"],
        sf_dir,
    )


def test_weights_bounded_and_total(spark, sf_dir):
    """Every weight lives in (0, 1], so 0 < decayed_count <= n_events;
    the anchor user's newest event is age 0."""
    rows = decay.user_decay_features(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.decayed_count <= r.n_events + 1e-9, r
        assert r.last_event_age_days >= 0.0, r
    assert min(r.last_event_age_days for r in rows) == 0.0


def _events_corpus(spark, sf_dir, tmp_path, rows):
    """Scratch sf-dir with a constructed events table (single-file
    parquet, the tests/test_vocab.py _corpus pattern)."""
    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    src = str(tmp_path / "decay_corpus")
    os.makedirs(src, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{src}/{t}.parquet")
    pa_pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    range(len(rows)), pa.int64()
                ),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array(
                    [r[0] for r in rows], pa.int64()
                ),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array(
                    [r[2] for r in rows], pa.float64()
                ),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        f"{src}/events.parquet",
    )
    return src


def test_half_life_arithmetic(spark, sf_dir, tmp_path):
    """Events at age 0 / 7 / 14 days weigh 1 / 0.5 / 0.25 exactly:
    decayed_count = 1.75 and, with values 10 / 20 / 40,
    decayed_value = 10·1 + 20·0.5 + 40·0.25 = 30. Oracle parity on
    the constructed corpus too (driver rigor)."""
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    src = _events_corpus(
        spark, sf_dir, tmp_path,
        [
            (1, t0, 10.0),
            (1, t0 - datetime.timedelta(days=7), 20.0),
            (1, t0 - datetime.timedelta(days=14), 40.0),
            (2, t0 - datetime.timedelta(days=7), 8.0),
        ],
    )
    assert_matches_oracle(
        decay.user_decay_features(spark, src),
        decay.ORACLES["user_decay_features"],
        src,
    )
    got = {
        r.user_id: r
        for r in decay.user_decay_features(spark, src).collect()
    }
    assert got[1].n_events == 3
    assert got[1].decayed_count == 1.75
    assert got[1].decayed_value == 30.0
    assert got[1].last_event_age_days == 0.0
    assert got[2].decayed_count == 0.5
    assert got[2].decayed_value == 4.0
    assert got[2].last_event_age_days == 7.0
