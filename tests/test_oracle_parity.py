"""Differential tests: every registered query vs its DuckDB oracle —
the same comparison the verification driver runs (sf0.01), run here at
sf0.001 for speed.  `pytest -m medium` (or RUN_SF=0.01) re-runs at sf0.01.
"""

from __future__ import annotations

import os

import pytest

from kafka_stream_processing_spark import registry
from tests.oracle_util import run_differential

SPECS = registry.all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
NO_ORACLE_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)

SF_DIR = os.environ.get("KSSP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    problems = run_differential(spark, SF_DIR, name, spec.fn, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_rows_only_query_runs(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "unique_users"}
    assert set(e.oracle_sql()) <= set(e.queries())
