"""Subquery forms and statistics aggregates (TPC-H-style coverage beyond
the §7.1 basics): scalar subqueries, IN-subqueries, correlated EXISTS with
extra predicates, distribution queries, and deterministic moment/quantile
statistics.

Catalyst de-correlates all of these into joins/aggregates — `spark.sql`
is used where SQL is the clearest expression (subqueries) and the
DataFrame API where composition is (statistics); both are first-class
front-ends of the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.functions.exact import dec
from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table


@register(
    "subquery_scalar_above_avg_price",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 1.04 * (SELECT avg(p_retailprice) FROM part)
    """,
    tags=("subqueries",),
)
def subquery_scalar_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → Catalyst plans one aggregate whose
    result is broadcast into the filter (a 2-row exchange at any scale).
    avg() of doubles is safe here: it feeds a strict inequality against
    values well away from the boundary, not an output column."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > 1.04 * (SELECT avg(p_retailprice) FROM part)
        """
    )


@register(
    "subquery_in_large_lineitems",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
    )
    """,
    tags=("subqueries",),
)
def subquery_in_large_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → planned as a left-semi join on the (filtered,
    deduplicated) subquery side; pushes the quantity filter into the
    lineitem scan."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
        )
        """
    )


@register(
    "subquery_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("subqueries",),
)
def subquery_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS with a non-equi correlation predicate
    (l_shipdate > o_orderdate) → de-correlated into a semi join with a
    mixed equi/range condition."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "subquery_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("subqueries",),
)
def subquery_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: outer join with an extra join-side predicate, then a
    distribution-of-counts second aggregate."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "subquery_q18_large_volume_customers",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 140
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("subqueries",),
)
def subquery_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a grouped-HAVING subquery (the subquery and the
    outer query aggregate the SAME table — Catalyst still scans lineitem
    twice; at 100 TB a production pipeline would materialize the order
    quantities once, which is exactly what the decimal-sum makes safe to
    cache)."""
    for name in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT c_name, o_orderkey, CAST(o_orderdate AS STRING) AS orderdate,
               o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 140
        )
        GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
        """
    )


@register(
    "agg_stats_orders",
    oracle="""
    WITH s AS (
        SELECT o_orderstatus,
               count(*) AS n,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
                   AS sum_sq,
               quantile_cont(o_totalprice, 0.5) AS median_price
        FROM orders
        GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n, min_price, max_price, median_price,
           sum_price / n AS mean_price,
           round(sqrt((sum_sq - sum_price * sum_price / n) / (n - 1)), 6)
               AS stddev_price
    FROM s
    """,
    tags=("statistics",),
)
def agg_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics done DETERMINISTICALLY: stddev from exact decimal
    sums via the two-pass-free formula sqrt((Σx² − (Σx)²/n)/(n−1)) rather
    than the engines' streaming-variance kernels (whose float merge order
    differs run to run and engine to engine).  Median via exact
    interpolated percentile (Spark `percentile` ≡ DuckDB quantile_cont —
    both exact, unlike approx_percentile/t-digest which could never
    cross-match)."""
    o = table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    s = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(price).alias("min_price"),
        F.max(price).alias("max_price"),
        F.sum(dec(price)).cast("double").alias("sum_price"),
        F.sum((price * price).cast("decimal(24,6)")).cast("double").alias("sum_sq"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
    )
    return s.select(
        "o_orderstatus",
        "n",
        "min_price",
        "max_price",
        "median_price",
        (F.col("sum_price") / F.col("n")).alias("mean_price"),
        F.round(
            F.sqrt(
                (F.col("sum_sq") - F.col("sum_price") * F.col("sum_price") / F.col("n"))
                / (F.col("n") - 1)
            ),
            6,
        ).alias("stddev_price"),
    )
