"""Deduplication operators for large-scale training-data pipelines.

Exact dedup is a hash groupBy; near-dup variants (MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine) follow in this module.  Cross-engine
determinism: all hashing goes through md5 (identical bytes→hex in Spark
and DuckDB), never engine-native hash() (Spark uses Murmur3/xxHash, DuckDB
its own — they would never agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group identical texts, keep the lowest doc_id as
    canonical.  Scale: shuffling a 32-char digest instead of the full
    document body keeps the exchange narrow at 100 TB; the group-by is a
    standard partial/final hash aggregate."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
