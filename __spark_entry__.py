"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``kafka_stream_processing_spark.registry``) — every implemented operator
from SURVEY.md §2 / §7 is registered there with its Spark callable and,
where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The engine package lives next to this file; make the import robust to
# whatever working directory the verification driver runs from.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from kafka_stream_processing_spark import registry  # noqa: E402

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
