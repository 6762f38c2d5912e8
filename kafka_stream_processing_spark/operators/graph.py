"""Iterative graph analytics beyond connected components: PageRank by
power iteration, with the engine's exact-arithmetic discipline applied to
an iterative NUMERIC algorithm (clustering.py covers the iterative
LABEL algorithm).

The graph: nation → nation trade edges weighted by shipment count
(supplier's nation ships to customer's nation — the q7 join shape).
PageRank runs a fixed 5 power iterations with damping 0.85.

Determinism across engines for iterative float math needs one rule
applied per iteration: per-edge contributions are computed in DOUBLE
(identical operand bits ⇒ identical product bits on both engines) then
quantized to DECIMAL(18,12) BEFORE the per-node sum, so the reduction is
associative and partitioning-independent; the damped update then returns
to DOUBLE.  Without the quantization step, double summation order would
diverge between engines — and between two Spark runs.

The DuckDB oracle unrolls the 5 iterations as chained CTEs (recursive
CTEs forbid aggregation in the recursive term — the standard SQL
restriction), which also documents that a FIXED-iteration power method
is expressible in one declarative query while Spark runs it as the
idiomatic driver loop with localCheckpoint-style small tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table

_DEC = "decimal(18,12)"
_TELEPORT = 0.006  # 0.15 / 25 nations, written as an exact literal
_DAMPING = 0.85
_ITERATIONS = 5


def _edges_sql() -> str:
    return """
        SELECT n1.n_name AS src, n2.n_name AS dst, count(*) AS w
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2
    """


def _oracle() -> str:
    # r0 = 1/25 exactly; each step: r' = 0.006 + 0.85 * sum(dec12(r*frac)).
    steps = []
    prev = "r0"
    for i in range(1, _ITERATIONS + 1):
        steps.append(f"""
    r{i} AS (
        SELECT n.node,
               {_TELEPORT} + {_DAMPING} * CAST(coalesce(SUM(
                   CAST(p.r * e.frac AS DECIMAL(18,12))
               ), 0) AS DOUBLE) AS r
        FROM nodes n
        LEFT JOIN frac e ON e.dst = n.node
        LEFT JOIN {prev} p ON p.node = e.src
        GROUP BY n.node
    )""")
        prev = f"r{i}"
    return f"""
    WITH edges AS (
        {_edges_sql()}
    ),
    nodes AS (
        SELECT n_name AS node FROM nation
    ),
    outw AS (
        SELECT src, SUM(w) AS total FROM edges GROUP BY 1
    ),
    frac AS (
        SELECT e.src, e.dst,
               CAST(e.w AS DOUBLE) / CAST(o.total AS DOUBLE) AS frac
        FROM edges e JOIN outw o ON o.src = e.src
    ),
    r0 AS (
        SELECT node, CAST(0.04 AS DOUBLE) AS r FROM nodes
    ),{",".join(steps)}
    SELECT node AS nation, round(r, 9) AS pagerank
    FROM {prev}
    """


@register(
    "graph_pagerank_trade",
    oracle=_oracle(),
    tags=("graph", "iterative"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 power iterations, damping 0.85) over the nation trade
    graph — the iterative-numeric complement of the min-label-propagation
    components operator.

    Scale: the rank table is one row per node (25 here; millions on a
    real graph) — each iteration is edges ⋈ ranks (hash join on src,
    ranks broadcast when small) + one map-side-combined sum per dst.
    Edge fractions are computed ONCE outside the loop.  Per-iteration
    quantization (see module docstring) keeps every iteration's ranks
    bit-identical to the oracle's, so 5 compounding iterations still
    hash-match exactly."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("src")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("total"))
    frac = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("total").cast("double")).alias(
                "frac"
            ),
        )
        # One materialization; every iteration reuses it without
        # re-running the 5-table join (the localCheckpoint idiom from
        # clustering.connected_components).
        .localCheckpoint(eager=True)
    )
    nodes = table(spark, sf_dir, "nation").select(F.col("n_name").alias("node"))
    ranks = nodes.withColumn("r", F.lit(0.04).cast("double"))
    for _ in range(_ITERATIONS):
        contrib = (
            frac.join(ranks, frac.src == ranks.node)
            .select("dst", (F.col("r") * F.col("frac")).cast(_DEC).alias("term"))
            .groupBy("dst")
            .agg(F.sum("term").alias("sum_dec"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(_TELEPORT)
                    + F.lit(_DAMPING)
                    * F.coalesce(F.col("sum_dec").cast("double"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("node").alias("nation"), F.round("r", 9).alias("pagerank")
    )
