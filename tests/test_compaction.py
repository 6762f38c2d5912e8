"""File-count assertions for the compaction connector (the registered
query proves content fidelity via the oracle; this proves the compaction
actually compacted)."""

from __future__ import annotations

import glob
import os

from kafka_stream_processing_spark.operators.connectors import (
    _tmp_dir,
    connector_compact_small_files,
)


def test_compaction_collapses_file_count(spark, sf_small):
    connector_compact_small_files(spark, sf_small).count()
    frag = glob.glob(os.path.join(_tmp_dir(sf_small, "fragmented"), "*.parquet"))
    comp = glob.glob(os.path.join(_tmp_dir(sf_small, "compacted"), "*.parquet"))
    assert len(frag) == 64
    assert 1 <= len(comp) <= 4
