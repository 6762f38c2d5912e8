"""Query registry — the single source of truth for the driver contract.

Every engine operator is exposed as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an equivalent
DuckDB oracle SQL string.  ``__spark_entry__.py`` is a thin re-export of
this registry; tests iterate it to run the same differential check the
driver runs (row count + schema + order-insensitive values).

Conventions that make cross-engine value-hashing deterministic:

- money/float aggregates: per-row ``CAST(expr AS DECIMAL(18,6))`` before
  SUM (exact, order-independent), final ``CAST(... AS DOUBLE)``;
- counts/int sums: BIGINT on both sides;
- truncated timestamps: CAST to string; raw timestamps: epoch microseconds;
- every computed column aliased identically in Spark and SQL;
- LIMIT/top-k queries carry a total deterministic ORDER BY (tie-broken by
  a key column).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_processing_spark.session import ensure_runtime_conf

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False  # included in bench.py's headline set
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, *, headline: bool = False,
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Register a query.  The wrapper pins runtime confs (session timezone,
    AQE) so semantics hold even on a SparkSession the engine didn't build."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            return fn(spark, sf_dir)

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, headline=headline,
            doc=(fn.__doc__ or "").strip(), tags=tuple(tags),
        )
        return wrapped

    return deco


def _load() -> None:
    """Import all operator modules (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are local to avoid circular imports at package import time.
    from kafka_stream_processing_spark.operators import (  # noqa: F401
        clustering,
        connectors,
        dedup,
        multimodal,
        python_udfs,
        quality,
        relational,
        scalar,
        similarity,
        subqueries,
        text,
        tpch_extra,
        windowed,
    )
    from kafka_stream_processing_spark.streaming import (  # noqa: F401
        joins,
        stateful,
        topk,
        unique_users,
    )

    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


def headline_names() -> list[str]:
    return [name for name, spec in all_specs().items() if spec.headline]


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's computation: unique users per 1-minute window."""
    return all_specs()["unique_users_per_minute"].fn(spark, sf_dir)
