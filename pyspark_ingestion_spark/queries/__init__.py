"""Query registry: every implemented operator exposed as a named query.

Each query is a pure ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables. The driver compares both at sf0.01 — this is the
correctness gate (see ``__spark_entry__.py``).

Column-name contract: every computed/aggregate column is aliased
identically in the Spark code and the oracle SQL, because the driver
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: registration) and return the registry."""
    from pyspark_ingestion_spark.queries import (  # noqa: F401
        catalog_multimodal,
        llm_ops,
        reference_parity,
        relational,
        streaming_batch,
        tpch,
        tpch_deep,
    )

    return dict(_REGISTRY)
