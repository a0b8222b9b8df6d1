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
        from ..ml import pipeline as ml_pipeline
        from ..similarity import ann
        from ..sources import multimodal
        from ..text import analysis as text_analysis
        from ..text import dedup as text_dedup

        _MODULES = [rfm, assembly, labeling, relational, aggregates,
                    windows, asof, scalars, fn_udtf, stream_windows,
                    stream_stateful, stream_rollup, text_analysis,
                    text_dedup, ann, ml_pipeline, ml_jobs, multimodal]
    return _MODULES


# Driver-budget rotation (the driver checks ~50 entries per round):
# round 3 front-loads (a) the entries whose most recent driver row is
# round 1 — the r2 PRIORITY list rotated them out, so their evidence
# is two rounds old — and (b) the entries that changed this round
# (canon-safe output rewrites + newly oracle-paired queries), so every
# entry's latest green row is at most one round old after r3.
PRIORITY = [
    # changed/newly-oracled this round — need fresh rows first
    "ml_feature_vectors",
    "multimodal_features",
    "multimodal_frames",
    "sampled_orders",
    "ann_lsh_bucketed",
    "ann_ivf_kmeans",
    "dedup_lsh_components",
    "dedup_lsh_groups",
    "corpus_dedup_keep",
    "corpus_sample_stratified",
    "dedup_incremental",
    # latest green row is r1 — re-prove before the evidence goes stale
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
