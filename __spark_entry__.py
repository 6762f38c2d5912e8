"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``kafka_stream_processing_spark.registry``) — every implemented operator
from SURVEY.md §2 / §7 is registered there with its Spark callable and,
where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_processing_spark import registry

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole computation: unique users per 1-minute tumbling
    window (reference UniqueUsersCounter.java:63-93), as one declarative
    Spark plan.
    """
    return registry.flagship(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    return registry.oracle_sql()
