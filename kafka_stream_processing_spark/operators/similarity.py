"""Similarity search over embedding columns (array<float>, 64-d).

Brute-force cosine top-k is the exactness baseline; LSH-bucketed variants
(random-hyperplane signatures) are the 100 TB path.  All vector math is
native Column expressions (zip_with/aggregate higher-order functions) —
JVM-side, no Python in the row path.

Cross-engine exactness: per-element products are computed in DOUBLE then
quantized to DECIMAL(18,12) before summation, making the reduction exact
and order-independent — Spark and DuckDB produce bit-identical cosines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table

_DEC = "decimal(18,12)"


def _as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_exact(a: Column, b: Column) -> Column:
    """Exact (decimal-quantized) dot product of two double arrays."""
    prods = F.zip_with(a, b, lambda x, y: (x * y).cast(_DEC))
    # The merge lambda must return the zero's exact type; the re-cast is
    # lossless (64 terms of |x|<=~10 stay far inside DECIMAL(18,12)).
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    ).cast("double")


def l2_norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot_exact(a, b) / (norm_a * norm_b)


@register(
    "similarity_bruteforce_topk",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, emb,
               sqrt(CAST(list_aggregate(
                   list_transform(range(1, 65),
                                  i -> CAST(emb[i] * emb[i] AS DECIMAL(18,12))),
                   'sum') AS DOUBLE)) AS nrm
        FROM v
    ),
    pairs AS (
        SELECT q.vec_id AS query_id,
               d.vec_id AS neighbor_id,
               CAST(list_aggregate(
                   list_transform(range(1, 65),
                                  i -> CAST(q.emb[i] * d.emb[i] AS DECIMAL(18,12))),
                   'sum') AS DOUBLE) / (q.nrm * d.nrm) AS cosine
        FROM n q
        JOIN n d ON d.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    )
    SELECT query_id, neighbor_id, cosine
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM pairs
    )
    WHERE rn <= 10
    """,
    headline=True,
    tags=("similarity",),
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors.  Scale: the query set
    is broadcast (queries × corpus is a map-side nested loop, no shuffle of
    the corpus); top-k per query collapses via row_number — with millions
    of queries, switch to the LSH-bucketed variant below."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double_array("embedding").alias("emb")
    )
    with_norm = emb.withColumn("nrm", l2_norm_exact(F.col("emb")))
    queries = with_norm.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = (
        with_norm.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_exact(
                F.col("q_emb"), F.col("emb"), F.col("q_nrm"), F.col("nrm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id", "cosine")
    )
