"""Near-dup clustering: connected components over the Jaccard pair graph.

Pairwise near-dup detection (dedup.py) yields EDGES; deduplication needs
CLUSTERS (each component keeps one canonical document).  Components are
computed by iterative min-label propagation — the canonical Spark pattern
for iterative graph algorithms:

    label(v) ← min(label(v), min over neighbors(label(u)))   until fixpoint

Each iteration is one join + one aggregate; ``localCheckpoint`` truncates
the lineage every round so the plan doesn't grow with the iteration count
(the classic iterative-Spark failure).  Convergence is diameter-bounded —
near-dup components are short chains, so a handful of rounds; a hard cap
turns pathological graphs into an explicit error rather than a hang.

Scale: the propagated state is (doc_id, label) pairs — 16 bytes/doc —
and only documents that appear in at least one near-dup pair enter the
graph at all (at 100 TB that's a small fraction of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.operators.dedup import (
    JACCARD_ORACLE,
    dedup_ngram_jaccard,
)
from kafka_stream_processing_spark.registry import register

MAX_ITERATIONS = 15


def connected_components(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Min-label propagation over an undirected edge list.
    Returns (node, component) where component = min node id reachable."""
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(MAX_ITERATIONS):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {MAX_ITERATIONS} iterations"
    )


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        {JACCARD_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r
        FROM reach JOIN edges e ON e.b = reach.node
    )
    SELECT node AS doc_id,
           min(r) AS cluster_id,
           count(*) AS cluster_size
    FROM (
        SELECT node, r FROM reach
    )
    GROUP BY node
    """,
    tags=("dedup", "iterative"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the 3-gram-Jaccard near-dup graph: each
    clustered document with its cluster id (min doc_id in the component,
    i.e. the canonical survivor) and the component's node count."""
    edges = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(edges, "doc_a", "doc_b")
    sizes = comp.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            "cluster_size",
        )
    )


@register(
    "dedup_pipeline_keep_stats",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        {JACCARD_ORACLE}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r
        FROM reach JOIN edges e ON e.b = reach.node
    ),
    clusters AS (
        SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN cluster_id IS NOT NULL
                          AND cluster_id <> doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN cluster_id IS NULL
                          OR cluster_id = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM documents LEFT JOIN clusters ON node = doc_id
    GROUP BY lang
    """,
    tags=("dedup", "pipeline"),
)
def dedup_pipeline_keep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END dedup decision a corpus pipeline actually ships:
    near-dup edges → connected components → one canonical survivor per
    cluster (min doc_id) → per-language keep/drop audit over the WHOLE
    corpus (singletons never enter the graph and are always kept).

    Scale: the expensive part is the edge detection (inverted-index
    shingle join, see dedup_ngram_jaccard); components run on the small
    near-dup subgraph; the final audit joins the (doc_id, cluster_id)
    labels — a table the size of the duplicate set, broadcastable at any
    realistic dup rate — back to a single scan of documents."""
    from kafka_stream_processing_spark.sources.tables import fanout, table

    edges = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(edges, "doc_a", "doc_b")
    d = fanout(table(spark, sf_dir, "documents"))
    labeled = d.join(
        F.broadcast(comp.withColumnRenamed("node", "doc_id")),
        "doc_id",
        "left",
    )
    dropped = F.col("label").isNotNull() & (F.col("label") != F.col("doc_id"))
    return labeled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(dropped, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        F.sum(F.when(~dropped, 1).otherwise(0)).cast("bigint").alias("n_kept"),
    )
