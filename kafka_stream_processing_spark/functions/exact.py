"""Exact (order-independent) float aggregation helpers.

Summing doubles is order-dependent; Spark's partial aggregation over an
arbitrary partitioning therefore produces non-deterministic low bits, which
breaks cross-engine value-hash comparison AND makes results irreproducible
run to run — unacceptable for an engine whose results feed a correctness
gate.  The fix: quantize each row to DECIMAL(18,6) (exact, associative,
commutative), aggregate exactly, cast the final result to DOUBLE.

At 100 TB this is also the *fast* path: Spark's decimal sum with precision
<= 18+10 runs on unscaled longs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_TYPE = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    """Quantize a double column/expression to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DECIMAL_TYPE)


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM over doubles, emitted as DOUBLE."""
    return F.sum(dec(col)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / bigint count, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)
