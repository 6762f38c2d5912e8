"""Additional TPC-H-pattern queries adapted to the driver schema —
conditional aggregation (Q12), ratio-of-sums (Q14), correlated scalar
threshold (Q17), anti-join + scalar subquery (Q22).  Each exercises a
de-correlation / rewrite pattern the previous queries don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.functions.exact import dec, dec_sum
from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table


@register(
    "q12_priority_shipping_classes",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    tags=("tpch",),
)
def q12_priority_shipping_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 pattern: conditional (CASE) aggregation splitting one
    pass into multiple counters — never two scans."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
            .alias("low_priority_count"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-09-01'
    """,
    tags=("tpch",),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 pattern: ratio of conditional sum to total sum in one
    aggregate (decimal interior, single double division at the end)."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", dec(revenue)).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(dec(revenue)).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
               AS avg_yearly,
           count(*) AS n_small_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.5 * avg_qty
    """,
    tags=("tpch",),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern: correlated per-group average threshold,
    de-correlated into a pre-aggregated join (the decimal-exact average
    keeps the `<` threshold decision identical across engines)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg.withColumnRenamed("l_partkey", "pa_key"),
              F.col("l_partkey") == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


@register(
    "q22_idle_customer_balances",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey % 5 AS INT) AS cust_group,
           count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    tags=("tpch",),
)
def q22_idle_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 pattern: scalar subquery threshold + filtered anti join
    (above-average-balance customers with no URGENT orders — every
    customer has SOME order in this data, so the anti-join side is the
    urgent subset), grouped."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("v")
        )
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("v"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy((F.col("c_nationkey") % 5).cast("int").alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal", "totacctbal"),
        )
    )
