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


def get_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    return out


def get_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    queries = get_queries()
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in queries:
                raise ValueError(f"oracle {name!r} has no matching query")
            out[name] = sql
    return out


# Materialized once at import for convenience.
QUERIES = get_queries()
ORACLES = get_oracles()
