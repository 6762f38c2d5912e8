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
