"""Local mimic of the driver's differential check: run a registered Spark
query and its DuckDB oracle on the same parquet tables, compare row count,
column names, and order-insensitive values.

Stricter than it needs to be on purpose: floats must match to 1e-12
relative (our decimal-quantized aggregates should match bit-exactly), so
any drift the driver's value-hash would flag shows up here first.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

from kafka_stream_processing_spark.sources.tables import TABLES

REL_TOL = 1e-12


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for col in out.columns:
        vals = out[col]
        if vals.dtype == object and vals.map(lambda v: isinstance(v, Decimal)).any():
            out[col] = vals.map(lambda v: float(v) if v is not None else None)
        elif str(vals.dtype).startswith("datetime64"):
            out[col] = vals.astype("datetime64[us]").astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=REL_TOL, abs_tol=1e-12)
    return a == b


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame, name: str) -> list[str]:
    problems: list[str] = []
    if sorted(actual.columns) != sorted(expected.columns):
        return [
            f"{name}: column mismatch spark={sorted(actual.columns)} "
            f"oracle={sorted(expected.columns)}"
        ]
    if len(actual) != len(expected):
        return [f"{name}: row count spark={len(actual)} oracle={len(expected)}"]
    a = _canonicalize(actual)
    e = _canonicalize(expected)
    for col in a.columns:
        av, ev = a[col].tolist(), e[col].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, ev))
            if not _values_equal(_norm(x), _norm(y))
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"{name}.{col}: {len(bad)}/{len(av)} values differ; "
                f"first at sorted-row {i}: spark={x!r} oracle={y!r}"
            )
    return problems


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
        return None
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def run_differential(spark, sf_dir: str, name: str, fn, oracle: str) -> list[str]:
    actual = fn(spark, sf_dir).toPandas()
    with duckdb_connection(sf_dir) as con:
        expected = con.execute(oracle).fetchdf()
    return compare_frames(actual, expected, name)
