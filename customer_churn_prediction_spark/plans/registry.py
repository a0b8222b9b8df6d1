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


# Queries the round-1 driver snapshot never reached (CORRECTNESS_r01.json
# stopped after the 50th registry entry; these were entries 51-66). They
# are emitted FIRST so that any driver-side time or count budget covers
# them this round; the previously-verified queries follow in module order.
PRIORITY = [
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_lsh_verified",
    "feature_bucketize",
    "feature_assembly_bucketed",  # new in r2 — needs its first driver row
    "dedup_lsh_groups",  # new in r2
    "dedup_lsh_components",  # new in r2
    "text_tfidf_topk",  # new in r2
    "ann_ivf",
    "ann_ivf_kmeans",  # new in r2
    "ann_bruteforce_topk",
    "embedding_neardup_pairs",
    "ann_lsh_bucketed",
    "ml_feature_vectors",
    "multimodal_features",
    "multimodal_frames",
    "ml_rf_churn",
    "ml_lr_churn",
    "ml_fm_churn",
    "ml_gbt_churn",
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
