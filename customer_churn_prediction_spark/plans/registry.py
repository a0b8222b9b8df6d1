"""Central registry of every named query the engine exposes.

Each operator module contributes a ``QUERIES`` dict
(name -> callable(spark, sf_dir) -> DataFrame) and an ``ORACLES`` dict
(name -> equivalent DuckDB ANSI SQL, omitted for non-SQL-expressible
ops). ``__spark_entry__.py`` re-exports this registry to the driver,
which hash-compares each pair at sf0.01 (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = None


def _modules():
    global _MODULES
    if _MODULES is None:
        from ..functions import scalars
        from ..functions import udtf as fn_udtf
        from ..operators import (
            aggregates,
            asof,
            assembly,
            labeling,
            relational,
            rfm,
            windows,
        )

        from ..streaming import rollup as stream_rollup
        from ..streaming import stateful as stream_stateful
        from ..streaming import windows as stream_windows
        from ..ml import jobs as ml_jobs
        from ..ml import monitoring as ml_monitoring
        from ..ml import pipeline as ml_pipeline
        from ..similarity import ann
        from ..sources import multimodal
        from ..text import analysis as text_analysis
        from ..text import dedup as text_dedup

        _MODULES = [rfm, assembly, labeling, relational, aggregates,
                    windows, asof, scalars, fn_udtf, stream_windows,
                    stream_stateful, stream_rollup, text_analysis,
                    text_dedup, ann, ml_pipeline, ml_jobs, ml_monitoring,
                    multimodal]
    return _MODULES


# Driver-budget rotation (the driver checks ~50 entries per round):
# round 5 front-loads (a) the 32 entries whose most recent driver row
# is round 3 — the r4 PRIORITY rotated them out, so their evidence is
# about to go two rounds stale — and (b) the queries changed or added
# this round (the int8 zero-norm/lateral-alias fixes, the metric-band
# oracle pairing for the four ml_* fits, and any new r5 operators).
# tests/test_registry_rotation.py asserts this list keeps every
# entry's latest green row at most one round old.
PRIORITY = [
    # latest green row is r3 — re-prove before the evidence goes stale
    "set_ops_buyers",
    "distinct_pairs",
    "salted_join_revenue",
    "groupby_sum",
    "range_join_events",
    "date_functions",
    "round_bround",
    "md5_salted_key",
    "string_functions",
    "json_extract_events",
    "text_sentences",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_events",
    "stream_user_totals",
    "rollup_daily_from_hourly",
    "text_stats",
    "text_lang_id",
    "text_token_counts",
    "text_fingerprint",
    "corpus_curation",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_groups",
    "corpus_dedup_keep",
    "ann_lsh_bucketed",
    "ann_ivf_kmeans",
    "ml_feature_vectors",
    "multimodal_features",
    "multimodal_frames",
    # changed or added this round — need fresh rows
    "ann_bruteforce_int8",
    "ann_bruteforce_int8_stored",
    "embedding_quantize",
    "ml_rf_churn",
    "ml_gbt_churn",
    "ml_lr_churn",
    "ml_fm_churn",
    "dedup_semantic",
    "text_repetition",
    "corpus_mix",
    "contamination_check",
    "text_logprob",
    "ann_recall_eval",
    "user_event_sequences",
    "corpus_keep_decision",
    "drift_psi",
    "score_band_lift",
    "eval_ks",
]


def get_queries() -> dict[str, QueryFn]:
    flat: dict[str, QueryFn] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in flat:
                raise ValueError(f"duplicate query name {name!r}")
            flat[name] = fn
    out: dict[str, QueryFn] = {}
    for name in PRIORITY:
        if name in flat:
            out[name] = flat[name]
    for name, fn in flat.items():
        if name not in out:
            out[name] = fn
    return out


def get_oracles() -> dict[str, str]:
    flat: dict[str, str] = {}
    queries = get_queries()
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in queries:
                raise ValueError(f"oracle {name!r} has no matching query")
            flat[name] = sql
    # Same priority-first iteration order as get_queries().
    return {name: flat[name] for name in queries if name in flat}


# Materialized once at import for convenience.
QUERIES = get_queries()
ORACLES = get_oracles()
