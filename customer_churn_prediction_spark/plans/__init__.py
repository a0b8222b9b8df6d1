"""Query-plan registry: the engine's public query surface."""

from .registry import ORACLES, QUERIES, get_oracles, get_queries

__all__ = ["QUERIES", "ORACLES", "get_queries", "get_oracles"]
