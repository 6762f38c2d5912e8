"""Queries exercised through the engine's SQL front-end (``spark.sql``)
rather than the DataFrame builder — the surface a SQL-first user of the
reference's data would hit.  Two families Spark 4 added that the
DataFrame API cannot express directly:

- **Correlated LATERAL subqueries** (SQL:1999 lateral derived tables):
  Catalyst de-correlates `, LATERAL (... ORDER BY ... LIMIT k)` into a
  WindowGroupLimit (per-partition partial top-k) — no per-row re-scan,
  which is what LATERAL naively means and what a 100 TB plan can't do.
- **Recursive CTEs** (`WITH RECURSIVE`): iterative computation declared
  in SQL.  Spark 4.1 supports UNION ALL recursion (monotone, acyclic);
  UNION-distinct recursion — what undirected transitive closure needs —
  is not supported yet (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so graph
  components keep the explicit min-label-propagation operator
  (operators/clustering.py) as their scale path.

Tables are passed as ``spark.sql`` DataFrame TEMPLATE arguments
(`{name}` placeholders) — no temp views, so repeated driver/bench
invocations never accumulate catalog entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table


@register(
    "sql_lateral_topk_per_customer",
    oracle="""
    SELECT c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l
    """,
    tags=("sql", "lateral"),
)
def sql_lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery with
    ORDER BY + LIMIT — the SQL spelling of per-group top-k.

    Scale: Catalyst de-correlates the lateral into
    WindowGroupLimit(row_number <= 2) partial + final around ONE shuffle
    on o_custkey (verified in tests/test_plans.py) — semantically the
    per-row subquery, physically the same plan as the window top-k
    operator.  Customers with no orders produce no rows (inner lateral),
    matching the oracle."""
    return spark.sql(
        """
        SELECT c_custkey, l.o_orderkey, l.o_totalprice
        FROM {customer}, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM {orders}
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) l
        """,
        customer=table(spark, sf_dir, "customer"),
        orders=table(spark, sf_dir, "orders"),
    )


@register(
    "sql_recursive_user_chain",
    oracle="""
    WITH RECURSIVE chain(user_id, anc) AS (
        SELECT DISTINCT user_id, user_id FROM events
        UNION ALL
        SELECT user_id, anc // 2 FROM chain WHERE anc > 1
    )
    SELECT user_id,
           count(*) AS chain_len,
           CAST(SUM(anc) AS BIGINT) AS chain_sum
    FROM chain
    GROUP BY user_id
    """,
    tags=("sql", "recursive"),
)
def sql_recursive_user_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE executed BY Spark (4.1 WITH RECURSIVE): each event
    user's binary ancestor chain (id → id/2 → … → 1), aggregated to
    chain length and sum — an iterative computation declared in SQL
    instead of a driver loop.

    Termination is structural (anc strictly decreases to 1, ~log2(id)
    levels — far under spark.sql.cteRecursionLevelLimit).  Scale: each
    recursion level is one narrow transform of the frontier; no step
    shuffles, only the final aggregate does.  For UNDIRECTED reachability
    (near-dup clusters) recursive SQL is not yet expressible in Spark
    (UNION-distinct unsupported) — use
    operators/clustering.py::connected_components."""
    return spark.sql(
        """
        WITH RECURSIVE chain(user_id, anc) AS (
            SELECT DISTINCT user_id, user_id FROM {events}
            UNION ALL
            SELECT user_id, anc DIV 2 FROM chain WHERE anc > 1
        )
        SELECT user_id,
               count(*) AS chain_len,
               CAST(SUM(anc) AS BIGINT) AS chain_sum
        FROM chain
        GROUP BY user_id
        """,
        events=table(spark, sf_dir, "events"),
    )
