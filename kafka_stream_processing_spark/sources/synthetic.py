"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic sequence source, registered as format ``kssp_sequence``.

This is the engine's demonstration that its source surface is extensible
below the DataFrame API — the same mechanism a production deployment
would use for an in-house feed (telemetry endpoint, proprietary archive
format) when no JVM connector exists.  The reader implements proper
PARTITION PLANNING: the row range is split into ``numPartitions`` slices,
each produced independently by an executor — so the custom source scales
out like any built-in one instead of funneling through the driver.

Determinism: row i carries md5(i) — reproducible on both engines, so the
whole custom-source path is oracle-checkable in DuckDB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "kssp_sequence"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SequenceDataSource(DataSource):
    """Options: n (total rows, default 1000), numPartitions (default 8)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "seq_id bigint, seq_hash string, bucket int"

    def reader(self, schema) -> DataSourceReader:
        return SequenceReader(self.options)


class SequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        step = (self.n + self.num_partitions - 1) // self.num_partitions
        return [
            _RangePartition(i * step, min((i + 1) * step, self.n))
            for i in range(self.num_partitions)
            if i * step < self.n
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            digest = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, digest, i % 16)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SequenceDataSource)
