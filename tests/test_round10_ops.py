"""Round-10 pins: data-driven SCD2 batch ordering (r09 VERDICT item 4)
and the round's new operators."""

from __future__ import annotations

import os
import shutil
import time

from kafka_stream_processing_spark.registry import all_specs
from tests.oracle_util import compare_frames, duckdb_connection

SPECS = all_specs()


# --------------------------------------- SCD2 mtime-order independence


def _stage_chunks_with_mtimes(src: str, dst: str, mtimes) -> None:
    files = sorted(f for f in os.listdir(src) if f.startswith("chunk-"))
    assert len(files) >= 2, "fixture must stage a multi-chunk stream"
    os.makedirs(dst, exist_ok=True)
    for f, mt in zip(files, mtimes(len(files))):
        p = os.path.join(dst, f)
        shutil.copy(os.path.join(src, f), p)
        os.utime(p, (mt, mt))


def _scd2_against_oracle(spark, sf_small, source_path: str) -> None:
    spec = SPECS["stream_scd2_incremental"]
    actual = spec.fn(spark, sf_small, _source_path=source_path).toPandas()
    with duckdb_connection(sf_small) as con:
        expected = con.execute(spec.oracle).fetchdf()
    problems = compare_frames(actual, expected, "stream_scd2_incremental")
    assert not problems, problems[:3]


def test_scd2_incremental_survives_reversed_mtimes(spark, sf_small, tmp_path):
    """FileStreamSource delivers oldest-mtime-first, so REVERSED chunk
    mtimes feed the micro-batches in exactly the wrong order.  The
    filename-ordinal stash-and-drain must still reconstruct the batch
    SCD2 history bit-for-bit (r09 VERDICT item 4: processing order
    derives from data, never filesystem mtimes)."""
    from kafka_stream_processing_spark.streaming.unique_users import (
        _stream_chunked_source_dir,
    )

    src = _stream_chunked_source_dir(sf_small)
    alt = str(tmp_path / "reversed")
    now = int(time.time())
    _stage_chunks_with_mtimes(
        src, alt, lambda n: [now - 2 * i for i in range(n)]
    )
    _scd2_against_oracle(spark, sf_small, alt)


def test_scd2_incremental_survives_equal_mtimes(spark, sf_small, tmp_path):
    """Equal whole-second mtimes — the v2-staging tie case where
    FileStreamSource's delivery order is arbitrary — must also
    reconstruct the exact history."""
    from kafka_stream_processing_spark.streaming.unique_users import (
        _stream_chunked_source_dir,
    )

    src = _stream_chunked_source_dir(sf_small)
    alt = str(tmp_path / "equal")
    now = int(time.time())
    _stage_chunks_with_mtimes(src, alt, lambda n: [now] * n)
    _scd2_against_oracle(spark, sf_small, alt)


# ------------------------------- dCor combination-step width budget


def test_dcor_width_budget_and_component_headroom(spark, sf_small):
    """ADVICE r09: the combination step's component casts must never be
    the binding constraint.  Pin (1) the width budget arithmetic — each
    product's operand widths sum to exactly DuckDB's 38-digit multiply
    ceiling with at least one operand >= 19 wide (hugeint path), and a
    BIGINT component always fits its cast; (2) measured component
    headroom at fixture scale against the documented ~2e5-doc bound."""
    import re

    from kafka_stream_processing_spark.operators.quality_assoc import (
        _DCOR_W_NUM,
    )

    pairs = re.findall(
        r"DECIMAL\((\d+),0\)\) \* CAST\([^)]*\s?AS DECIMAL\((\d+),0\)",
        _DCOR_W_NUM,
    )
    assert len(pairs) == 4, _DCOR_W_NUM  # n*n inner + the 3 products
    inner, products = pairs[0], pairs[1:]
    for w1, w2 in products:
        assert int(w1) + int(w2) == 38, (w1, w2)
        assert max(int(w1), int(w2)) >= 19, (w1, w2)
        # a BIGINT component (< 9.3e18) always fits the wider cast
        assert max(int(w1), int(w2)) >= 19
    assert int(inner[0]) >= 19  # n*n computed on the hugeint path

    row = (
        SPECS["quality_dcor_length_vocab"].fn(spark, sf_small).first()
    )
    # all three quadratic forms are nonneg and the combination stayed
    # exact (no silent NULL anywhere in the decimal chain)
    assert row.dcov2_num is not None and row.dvar2_x is not None
    assert row.dvar2_y is not None and row.dcor is not None
    assert row.dvar2_x >= 0 and row.dvar2_y >= 0
    # measured headroom: at n docs the n^4-scale numerator must sit
    # well inside DECIMAL(38,0) — documents the growth-rate argument
    # behind the ~2e5-doc component bound (TR ~ n^3 span^2)
    n = row.n_docs
    assert max(abs(row.dcov2_num), row.dvar2_x, row.dvar2_y) < 1e38 * (
        n / 2e5
    ) ** 3 + 1e30
