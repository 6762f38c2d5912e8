"""Relational core: scans, project/filter, aggregations, joins, analytic
window functions, sorts/limits, set operations (SURVEY.md §7.1).

The reference implements NONE of these (SURVEY.md §2.1 — no .filter(), no
joins, no sorts anywhere in UniqueUsersCounter.java); they are required by
the driver contract and are all built-in Spark, so each query here is a
declarative plan Catalyst fully optimizes (predicate pushdown into the
parquet scan, column pruning, broadcast join selection, partial
aggregation).  Scale notes are per-query in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_processing_spark.functions.exact import dec, dec_avg, dec_sum
from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table

# ---------------------------------------------------------------------------
# Project / filter
# ---------------------------------------------------------------------------


@register(
    "filter_project_events",
    oracle="""
    SELECT event_id,
           user_id,
           event_type,
           value,
           epoch_us(ts) AS ts_us
    FROM events
    WHERE event_type IN ('purchase', 'signup')
      AND value > 100.0
      AND user_id % 2 = 0
    """,
)
def filter_project_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate + projection.  Both the IN-filter and the column
    selection reach the parquet scan (PushedFilters / ReadSchema) — the
    optimization the reference hand-codes by projecting uid early
    (UniqueUsersCounter.java:68)."""
    events = table(spark, sf_dir, "events")
    return (
        events
        .filter(
            F.col("event_type").isin("purchase", "signup")
            & (F.col("value") > 100.0)
            & (F.col("user_id") % 2 == 0)
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan-heavy aggregation.  Scale: single shuffle on a
    6-value grouping key after map-side partial aggregation; the dominant
    cost is the parquet scan, which prunes to 7 of 11 columns and pushes
    the shipdate filter into row-group statistics."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li
        .filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_rollup_lineitem",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — Catalyst plans a single Expand + hash
    aggregate, no extra passes over the scan."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dec_sum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations in one pass)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(dec_sum("o_totalprice", "sum_price"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two disjoint groupings, one scan)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_having_high_value_users",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    HAVING SUM(CAST(value AS DECIMAL(18,6))) > 1000
    """,
)
def agg_having_high_value_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — post-aggregation predicate."""
    events = table(spark, sf_dir, "events")
    return (
        events
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dec_sum("value", "total_value"),
        )
        .filter(F.col("total_value") > 1000)
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + agg + top-k.  Scale: customer (filtered
    to one segment) is broadcast; orders⋈lineitem is the only shuffle and
    both filters are pushed into the scans.  Top-k is a deterministic
    (revenue, key) ordering so LIMIT is stable across engines."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    headline=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join.  Scale: nation/region carry
    explicit broadcast hints (fixed 25/5 rows at EVERY SF); supplier
    deliberately does NOT — it grows linearly with SF (~1B rows at the
    100 TB point), and an explicit hint overrides AQE's size check, so
    hinting it trades a safe shuffle join at scale for executor OOM.
    At small SF, AQE's runtime broadcast conversion picks supplier up
    anyway once its post-shuffle size is known (SCALE.md's stated
    policy: hint only never-grows dimensions, let AQE promote the
    rest).  The only unconditional shuffles are orders⋈lineitem and
    customer⋈orders on their join keys."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue, "revenue"))
    )


@register(
    "join_left_outer_nation_customer_count",
    oracle="""
    SELECT n.n_name,
           COUNT(c.c_custkey) AS n_customers
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_left_outer_nation_customer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving empty nations (count=0 rows survive)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    """,
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — emits each matching customer once."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_full_outer_nation_presence",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
                FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           COALESCE(cn.n_customers, 0) AS n_customers,
           COALESCE(sn.n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (customer vs supplier
    presence per nation).  Pre-aggregating before the outer join keeps the
    shuffled sides tiny at any scale."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_range_quantity_size",
    oracle="""
    SELECT p.p_partkey,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM part p
    JOIN lineitem l
      ON l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    WHERE p.p_brand = 'Brand#1'
      AND l.l_returnflag = 'R'
    GROUP BY p.p_partkey
    """,
)
def join_range_quantity_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: lineitem quantity within ±2 of part
    size, rewritten as a bucketed EQUI-join: each part row expands to its
    5 integer buckets [p_size-2, p_size+2], lineitem probes on
    floor(l_quantity), and the exact range predicate remains as a
    residual filter (so semantics hold for fractional quantities too —
    floor(q) ∈ [s-2, s+2] is implied by q ∈ [s-2, s+2] when s is int).

    Scale: a naive theta join is a BroadcastNestedLoopJoin evaluating
    |lineitem|×|part| predicates; the bucket expansion turns it into a
    broadcast HASH join probing |lineitem| keys against 5×|part| entries
    — the standard interval-to-equi expansion for bounded-width range
    joins (measured ~15% faster locally at sf0.1, and O(n) instead of
    O(n·m) predicate evaluations at scale)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    buckets = p.select(
        "p_partkey",
        "p_size",
        F.explode(
            F.sequence(F.col("p_size") - 2, F.col("p_size") + 2)
        ).alias("qb"),
    )
    probes = li.withColumn("qb", F.floor("l_quantity").cast("int"))
    residual = (F.col("l_quantity") >= F.col("p_size") - 2) & (
        F.col("l_quantity") <= F.col("p_size") + 2
    )
    return (
        probes.join(F.broadcast(buckets), "qb")
        .filter(residual)
        .groupBy("p_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dec_sum("l_quantity", "sum_qty"),
        )
    )


@register(
    "join_asof_purchase_last_click",
    oracle="""
    SELECT p.event_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(c.ts) AS last_click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase, the user's most recent click at or
    before the purchase.  Spark lacks a native batch as-of join; the
    scalable formulation is a tagged UNION + last(ignorenulls) running
    window — one shuffle on user_id, no point-in-time self-join explosion."""
    events = table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("kind"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
        F.lit(1).alias("kind"),
    )
    # At equal timestamps the click (kind=0) sorts before the purchase, so
    # a click at exactly the purchase instant is included — matching ASOF's
    # `p.ts >= c.ts`.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            F.unix_micros("ts").alias("purchase_ts_us"),
            F.unix_micros("last_click").alias("last_click_ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# Analytic window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey,
               o_orderkey,
               o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderstatus) AS status_rank,
               dense_rank() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderstatus) AS status_dense_rank
        FROM orders
    ) WHERE rn <= 3
    """,
    headline=True,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number + rank/dense_rank.  Scale: one
    shuffle on the partition key; Spark 3.5+ pushes the rn<=3 limit into
    the sort (WindowGroupLimit) so no group is fully materialized."""
    o = table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    by_status = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(by_price).alias("rn"),
            F.rank().over(by_status).alias("status_rank"),
            F.dense_rank().over(by_status).alias("status_dense_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total_per_customer",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame (exact decimal interior)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_lag_lead_user_events",
    oracle="""
    SELECT event_id,
           user_id,
           epoch_us(ts) AS ts_us,
           epoch_us(lag(ts) OVER w) AS prev_ts_us,
           epoch_us(lead(ts) OVER w) AS next_ts_us,
           lag(event_type, 1, 'none') OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation within per-user event timelines."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.lag("ts").over(w)).alias("prev_ts_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("next_ts_us"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@register(
    "window_range_frame_revenue",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           days,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY days
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_30d_spend,
           round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6)
               AS price_pct_rank,
           round(cume_dist() OVER (ORDER BY o_totalprice, o_orderkey), 6)
               AS price_cume_dist
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days
        FROM orders
    )
    """,
)
def window_range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (trailing 30-day spend per customer — a value-based
    frame, not a row count) plus percent_rank/cume_dist distribution
    functions.  Range frames need a numeric ordering key, so the date is
    projected to day-offset first — same trick both engines."""
    o = table(spark, sf_dir, "orders")
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    )
    base = o.select("o_orderkey", "o_custkey", "o_totalprice", days.alias("days"))
    trailing = (
        Window.partitionBy("o_custkey")
        .orderBy("days")
        .rangeBetween(-30, Window.currentRow)
    )
    by_price = Window.orderBy("o_totalprice", "o_orderkey")
    return base.select(
        "o_orderkey",
        "o_custkey",
        "days",
        F.sum(dec("o_totalprice")).over(trailing).cast("double")
        .alias("trailing_30d_spend"),
        F.round(F.percent_rank().over(by_price), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(by_price), 6).alias("price_cume_dist"),
    )


@register(
    "agg_salted_high_cardinality",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("scale", "skew"),
)
def agg_salted_high_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation for skewed grouping keys: only 5
    event_type values exist, so a naive groupBy funnels 100 TB into 5
    reducers.  Phase 1 groups by (key, salt=user_id%32) — 32-way fan-out
    per hot key; phase 2 re-aggregates the partial results (160 rows).
    Decimal partials make the two-phase sum exactly equal the direct one,
    which is what the oracle verifies."""
    events = table(spark, sf_dir, "events")
    salted = (
        events
        .withColumn("salt", (F.col("user_id") % 32).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(dec("value")).alias("pv"),
        )
    )
    return (
        salted.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
    )


@register(
    "window_ntile_customer_value",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile
    FROM customer
    """,
)
def window_ntile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing over a global deterministic ordering.  Note: a
    global (unpartitioned) window serializes through one task — fine for a
    1500-row dimension, never for a fact table; at scale bucket via
    percent_rank over pre-aggregated keys instead."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


@register(
    "histogram_event_values",
    oracle="""
    SELECT CAST(least(floor(value / 10.0), 19) AS BIGINT) AS bucket,
           count(*) AS n,
           min(value) AS lo,
           max(value) AS hi
    FROM events
    GROUP BY 1
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via portable floor-bucketing (clamped top
    bucket) — one pass, one tiny aggregate; the building block behind
    NDV/selectivity estimation at scale."""
    events = table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 10.0), F.lit(19)).cast("bigint")
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "setops_bag_semantics",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — each custkey appears min(n_open,
    n_filled) times), complementing the distinct set ops above."""
    o = table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    filled_keys = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_keys.intersectAll(filled_keys)


@register(
    "pivot_event_type_daily",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS day,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'error') AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'view') AS view
    FROM events
    GROUP BY 1
    """,
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: daily event counts, one column per event type.  The pivot
    values are ENUMERATED explicitly — at scale an implicit pivot triggers
    an extra distinct-scan to discover them, and unbounded pivot width is
    a schema hazard."""
    events = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        events
        .groupBy(F.date_trunc("day", "ts").cast("string").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # Pivot leaves NULL for absent combinations; the oracle's FILTER
    # counts yield 0 — align on 0.
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@register(
    "unpivot_stats_long_form",
    oracle="""
    SELECT o_orderstatus, metric, value FROM (
        SELECT o_orderstatus,
               CAST(count(*) AS DOUBLE) AS n_orders,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders GROUP BY 1
    ) UNPIVOT (value FOR metric IN (n_orders, min_price, max_price))
    """,
)
def unpivot_stats_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-status stats to long (status, metric,
    value) form — the shape feature stores and plotting layers want."""
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["n_orders", "min_price", "max_price"],
        "metric",
        "value",
    )


@register(
    "null_handling_order_gaps",
    oracle="""
    WITH g AS (
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS prev_price
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           coalesce(prev_price, 0.0) AS prev_price_filled,
           prev_price IS NULL AS is_first_order,
           nullif(coalesce(prev_price, 0.0), 0.0) IS NULL AS nullif_roundtrip
    FROM g
    """,
)
def null_handling_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce / IS NULL / nullif over the nulls
    that lag() introduces at partition starts."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )
    filled = F.coalesce("prev_price", F.lit(0.0))
    return g.select(
        "o_custkey",
        "o_orderkey",
        filled.alias("prev_price_filled"),
        F.col("prev_price").isNull().alias("is_first_order"),
        F.nullif(filled, F.lit(0.0)).isNull().alias("nullif_roundtrip"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------


@register(
    "orderby_limit_top_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate IS NULL AS ship_null
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 25
    """,
)
def orderby_limit_top_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT.  Scale: Spark plans TakeOrderedAndProject
    — each task keeps a 25-row heap; no global sort materializes."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.col("l_shipdate").isNull().alias("ship_null"),
        )
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
                 F.col("l_linenumber").asc())
        .limit(25)
    )


@register(
    "setops_nation_presence",
    oracle="""
    (SELECT 'both' AS side, c_nationkey AS nationkey FROM customer
     INTERSECT
     SELECT 'both', s_nationkey FROM supplier)
    UNION ALL
    (SELECT 'customer_only' AS side, c_nationkey AS nationkey FROM customer
     EXCEPT
     SELECT 'customer_only', s_nationkey FROM supplier)
    """,
)
def setops_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one query (ANSI distinct set
    semantics, parenthesized explicitly)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = (
        c.select(F.lit("both").alias("side"), "nationkey")
        .intersect(s.select(F.lit("both").alias("side"), "nationkey"))
    )
    cust_only = (
        c.select(F.lit("customer_only").alias("side"), "nationkey")
        .subtract(s.select(F.lit("customer_only").alias("side"), "nationkey"))
    )
    return both.unionByName(cust_only)


@register(
    "join_null_safe_equality",
    oracle="""
    WITH cust AS (
        SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nkey,
               count(*) AS n_customers
        FROM customer GROUP BY 1
    ),
    supp AS (
        SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END AS nkey,
               count(*) AS n_suppliers
        FROM supplier GROUP BY 1
    )
    SELECT CAST(c.nkey AS INT) AS nkey, c.n_customers, s.n_suppliers
    FROM cust c JOIN supp s ON c.nkey IS NOT DISTINCT FROM s.nkey
    """,
    tags=("joins", "null-semantics"),
)
def join_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the
    delinquent-account rows of both sides collapse to a NULL key, and the
    null-safe join matches the two NULL groups — where a plain `=` join
    would silently drop them (NULL = NULL is NULL).  The join-key family
    every data-cleaning pipeline eventually needs.

    Scale: Spark plans `<=>` as a HASH join (EqualNullSafe is a valid
    equi-join key, hashing NULL as a regular bucket) — not the
    nested-loop fallback a theta-join would get, so null-safe keys cost
    the same as plain keys."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cust = c.groupBy(
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nkey")
    ).agg(F.count(F.lit(1)).alias("n_customers"))
    supp = s.groupBy(
        F.when(F.col("s_acctbal") < 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("skey")
    ).agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        cust.join(supp, F.col("nkey").eqNullSafe(F.col("skey")))
        .select(
            F.col("nkey").cast("int").alias("nkey"),
            "n_customers",
            "n_suppliers",
        )
    )


@register(
    "funnel_click_to_purchase",
    oracle="""
    WITH fc AS (
        SELECT user_id, min(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    conv AS (
        SELECT fc.user_id,
               min(e.ts) AS first_purchase,
               min(epoch_us(e.ts) - epoch_us(fc.first_click)) AS gap_us
        FROM fc JOIN events e
          ON e.user_id = fc.user_id
         AND e.event_type = 'purchase'
         AND e.ts > fc.first_click
        GROUP BY fc.user_id
    )
    SELECT (SELECT count(*) FROM fc) AS n_clicked,
           (SELECT count(*) FROM conv) AS n_converted,
           CAST((SELECT SUM(CAST(gap_us AS DECIMAL(18,0))) FROM conv)
                AS BIGINT) AS total_gap_us
    """,
    tags=("funnel", "behavioral"),
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: users whose FIRST click is later followed by a
    purchase — the conversion query behind every behavioral dashboard.
    Step order matters (a purchase BEFORE the first click doesn't
    convert), which plain joins/aggregations can't express without the
    per-user first-event anchoring.

    Scale: two shuffles on user_id (first-click agg, conversion agg) —
    both map-side combined; the anchor join is user-keyed, never a time
    cross join.  Gap total stays integer microseconds (exact)."""
    events = table(spark, sf_dir, "events")
    fc = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    conv = (
        fc.join(
            events.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
            ),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("first_click")),
        )
        .groupBy("user_id")
        .agg(
            (
                F.min(F.unix_micros("p_ts") - F.unix_micros("first_click"))
            ).alias("gap_us")
        )
    )
    n_clicked = fc.agg(F.count(F.lit(1)).alias("n_clicked"))
    n_conv = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.sum(F.col("gap_us").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("total_gap_us"),
    )
    return n_clicked.crossJoin(n_conv)


#: Interval-join bucket width (epoch micros): one hour.
_IVL_BUCKET_US = 3_600_000_000


@register(
    "join_interval_overlap_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid,
               ts
        FROM flagged
    ),
    ivl AS (
        SELECT user_id, sid,
               epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
        FROM sess GROUP BY user_id, sid
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(count(*) AS BIGINT) AS n_overlaps
    FROM ivl a
    JOIN ivl b ON a.user_id < b.user_id
              AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1, 2
    """,
    tags=("joins", "interval"),
)
def join_interval_overlap_sessions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-overlap join — the θ-join family's last member (after
    range and as-of): which user pairs had CONCURRENT sessions, counted
    per pair.  Sessions are the 5-minute-gap islands the sessionization
    oracle defines; two intervals overlap iff a.start ≤ b.end ∧
    b.start ≤ a.end.  The scalable plan turns the θ-predicate into an
    EQUI-join: each interval explodes into the hour buckets it spans,
    candidate pairs meet inside a bucket (never all-pairs), are
    deduplicated on the session-pair key, and the exact predicate
    re-verifies — generate-superset-then-filter, the same discipline as
    every LSH operator here, applied to time.  The oracle runs the
    direct θ-join, so the bucketed plan is checked against the naive
    semantics it replaces.

    Scale: bucket fan-out is interval_len/bucket + 1 rows per session;
    the join cost is Σ per-bucket concurrency² — bounded by true
    temporal concurrency (the thing being measured), not table size;
    bucket width is the knob (too narrow: fan-out; too wide:
    false candidates — the classic interval-index trade)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    lag = F.lag("ts").over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            lag.isNull()
            | (F.unix_micros("ts") - F.unix_micros(lag) >= 300_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ivl = sess.groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts")).alias("s"),
        F.unix_micros(F.max("ts")).alias("e"),
    )
    buckets = ivl.select(
        "user_id",
        "sid",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s div {_IVL_BUCKET_US}"),
                F.expr(f"e div {_IVL_BUCKET_US}"),
            )
        ).alias("bucket"),
    )
    a = buckets.select(
        F.col("user_id").alias("user_a"),
        F.col("sid").alias("sid_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
        "bucket",
    )
    b = buckets.select(
        F.col("user_id").alias("user_b"),
        F.col("sid").alias("sid_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
        "bucket",
    )
    cand = (
        a.join(b, "bucket")
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "sid_a", "sa", "ea", "user_b", "sid_b", "sb", "eb")
        .distinct()
    )
    return (
        cand.filter(
            (F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea"))
        )
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlaps"))
    )


#: Nearest-as-of tolerance: a click counts only within ±5 minutes of
#: the purchase.
ASOF_NEAREST_TOL_US = 5 * 60 * 1_000_000


@register(
    "join_asof_nearest_click",
    # Oracle formulation: per purchase, rank ALL in-tolerance clicks by
    # (|Δt|, backward-before-forward, engine's tie order) and keep the
    # best — a direct quadratic-within-tolerance restatement that never
    # uses the engine's union+window mechanics.
    oracle=f"""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    cand AS (
        SELECT p.event_id, epoch_us(p.ts) AS pts,
               epoch_us(c.ts) AS cts, c.event_id AS click_id,
               abs(epoch_us(c.ts) - epoch_us(p.ts)) AS ad,
               (c.ts > p.ts) AS is_fwd
        FROM p JOIN c ON c.user_id = p.user_id
         AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= {ASOF_NEAREST_TOL_US}
    ),
    best AS (
        SELECT event_id, pts, cts, click_id,
               row_number() OVER (
                   PARTITION BY event_id
                   ORDER BY ad, is_fwd,
                            CASE WHEN is_fwd THEN click_id
                                 ELSE -click_id END) AS rn
        FROM cand
    )
    SELECT p.event_id,
           epoch_us(p.ts) AS purchase_ts_us,
           b.cts AS click_ts_us,
           b.click_id,
           b.cts - epoch_us(p.ts) AS delta_us
    FROM p LEFT JOIN best b ON b.event_id = p.event_id AND b.rn = 1
    """,
    tags=("joins", "asof"),
)
def join_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-as-of join with tolerance — the pandas merge_asof
    (direction='nearest') semantics the backward-only as-of can't give:
    for each purchase, the user's closest click within ±5 minutes,
    before OR after, ties preferring the earlier (backward) click.
    Composes the backward kernel of join_asof_purchase_last_click with
    its forward mirror: ONE tagged union sorted per user carries both a
    running last-click (preceding frame) and a coming first-click
    (following frame), then a row-local comparison picks the nearer
    in-tolerance candidate — still one shuffle on user_id, never a
    time-range self-join.

    Tie conventions (mirrored in the oracle): equal |Δt| → backward;
    equal-timestamp backward clicks → largest event_id (the union
    sort's last row); equal-timestamp forward clicks → smallest.

    Scale: identical shape to the backward as-of — the union sorts
    within user partitions only (events per user is the bound, not
    stream length), both frames ride the SAME sort, and tolerance is a
    row-local filter, not a join predicate."""
    events = table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("kind"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
        F.lit(1).alias("kind"),
    )
    order = [F.col("ts"), F.col("kind"), F.col("click_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    u = clicks.unionByName(purchases).select(
        "*",
        F.last("click_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.last("click_id", ignorenulls=True).over(wb).alias("b_id"),
        F.first("click_ts", ignorenulls=True).over(wf).alias("f_ts"),
        F.first("click_id", ignorenulls=True).over(wf).alias("f_id"),
    )
    p = u.filter(F.col("kind") == 1)
    pts = F.unix_micros("ts")
    db = pts - F.unix_micros("b_ts")  # >= 0
    df_ = F.unix_micros("f_ts") - pts  # > 0
    b_ok = F.col("b_ts").isNotNull() & (db <= ASOF_NEAREST_TOL_US)
    f_ok = F.col("f_ts").isNotNull() & (df_ <= ASOF_NEAREST_TOL_US)
    take_b = b_ok & (~f_ok | (db <= df_))
    take_f = ~take_b & f_ok
    click_ts_us = (
        F.when(take_b, F.unix_micros("b_ts"))
        .when(take_f, F.unix_micros("f_ts"))
    )
    click_id = F.when(take_b, F.col("b_id")).when(take_f, F.col("f_id"))
    return p.select(
        "event_id",
        pts.alias("purchase_ts_us"),
        click_ts_us.alias("click_ts_us"),
        click_id.alias("click_id"),
        (click_ts_us - pts).alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier)
# ---------------------------------------------------------------------------


@register(
    "join_skyline_parts",
    # The oracle deliberately uses the TEXTBOOK quadratic NOT EXISTS
    # formulation — a genuinely different algorithm from the engine's
    # O(n log n) window frontier, so the differential check validates
    # the semantics, not a shared derivation.
    oracle="""
    SELECT p.p_partkey, CAST(p.p_size AS INT) AS p_size,
           CAST(CAST(p.p_retailprice AS DECIMAL(18,6)) AS DOUBLE)
               AS p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_size >= p.p_size
          AND q.p_retailprice <= p.p_retailprice
          AND (q.p_size > p.p_size
               OR q.p_retailprice < p.p_retailprice)
    )
    """,
    tags=("relational", "skyline", "optimization"),
)
def join_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts — maximize size, minimize
    retail price; the classic preference query (every part NOT
    dominated by one that is at least as big AND at least as cheap,
    strictly better somewhere).  The engine does NOT run the textbook
    quadratic anti-join: a point survives iff (a) its price is
    strictly below the minimum price among all STRICTLY larger sizes
    (one suffix-min window over the per-size price minima) and (b) it
    holds the minimum price within its own size group (same-size
    cheaper ⇒ dominated; same-size equal price ⇒ mutually
    undominated, standard skyline tie semantics).  That reduces the
    O(n²) dominance test to one size-grouped aggregate + one
    size-ordered window + one value-level join back — every compare
    on exact integers/decimals, no floats.

    Scale: groupBy(size) is map-side combined to the size-cardinality
    table; the suffix-min window runs over DISTINCT sizes
    (domain-sized, not row-sized); the join back is a broadcast of
    the frontier thresholds.  The quadratic form lives only in the
    oracle."""
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("int").alias("p_size"),
        F.col("p_retailprice").cast("decimal(18,6)").alias("price"),
    )
    per_size = p.groupBy("p_size").agg(F.min("price").alias("minp"))
    w_suffix = (
        Window.orderBy(F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_size.select(
        "p_size",
        "minp",
        F.min("minp").over(w_suffix).alias("min_larger"),
    )
    return (
        p.join(F.broadcast(frontier), "p_size")
        .filter(
            (F.col("price") == F.col("minp"))
            & (
                F.col("min_larger").isNull()
                | (F.col("price") < F.col("min_larger"))
            )
        )
        .select(
            "p_partkey",
            "p_size",
            F.col("price").cast("double").alias("p_retailprice"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution over click→purchase journeys
# ---------------------------------------------------------------------------

#: Attribution lookback window (days before the purchase).
ATTRIB_LOOKBACK_DAYS = 7
#: Number of synthetic channels (props.k % N).
ATTRIB_CHANNELS = 4


@register(
    "join_attribution_multitouch",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id, ts AS c_ts, event_id AS c_id,
               'ch' || CAST(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT) % {ATTRIB_CHANNELS}
                            AS VARCHAR) AS channel
        FROM events WHERE event_type = 'click'
    ),
    pur AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id, value
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT p.p_id, p.value, c.channel, c.c_ts, c.c_id
        FROM pur p JOIN clicks c
          ON c.user_id = p.user_id
         AND c.c_ts < p.p_ts
         AND c.c_ts >= p.p_ts - INTERVAL {ATTRIB_LOOKBACK_DAYS} DAY
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY p_id
                                  ORDER BY c_ts, c_id) AS rn,
               count(*) OVER (PARTITION BY p_id) AS cnt
        FROM j
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first,
           CAST(SUM(CASE WHEN rn = cnt THEN 1 ELSE 0 END) AS BIGINT)
               AS n_last,
           CAST(COALESCE(SUM(CASE WHEN rn = 1
                             THEN CAST(value AS DECIMAL(18,6)) END),
                         0) AS DOUBLE) AS first_touch_credit,
           CAST(COALESCE(SUM(CASE WHEN rn = cnt
                             THEN CAST(value AS DECIMAL(18,6)) END),
                         0) AS DOUBLE) AS last_touch_credit,
           CAST(SUM(CAST(round(value / cnt, 6) AS DECIMAL(18,6)))
                AS DOUBLE) AS linear_credit
    FROM ranked GROUP BY channel
    """,
    tags=("relational", "join", "attribution"),
)
def join_attribution_multitouch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-touch marketing attribution: each purchase's value is
    credited to the user's clicks in the prior ATTRIB_LOOKBACK_DAYS
    under THREE models at once — first-touch (all value to the
    journey's earliest click), last-touch (to the latest; the
    per-journey generalization of join_asof_purchase_last_click), and
    linear (value/k to each of the k touches) — per channel (a
    deterministic props.k % {ATTRIB_CHANNELS} pseudo-channel: the
    testdata carries no marketing dimension, so the channel is
    synthetic but the mechanics — journey assembly, position ranking,
    fractional credit — are the real operator).  Journey membership is
    a range join (same user, click strictly before the purchase,
    within the lookback); positions rank by (ts, event_id) — the
    registry's deterministic-tiebreak convention; full-value credits
    sum as exact decimals and linear shares as round-6 decimals, so
    every credit column is bit-stable cross-engine.

    Scale: the range join hash-partitions on user_id (journeys never
    cross users) and the lookback bound caps fan-out per purchase at
    the user's click rate × {ATTRIB_LOOKBACK_DAYS} days; the position
    window partitions by purchase — no global sort anywhere.  At
    100 TB, bucket both sides by user_id to make the join co-located
    (connector_bucketed_join_colocated demonstrates the layout) and
    AQE handles skewed super-clickers."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.concat(
            F.lit("ch"),
            (k % ATTRIB_CHANNELS).cast("string"),
        ).alias("channel"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        "value",
    )
    j = pur.join(
        clicks,
        (clicks["user_id"] == pur["user_id"])
        & (F.col("c_ts") < F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts")
            - F.expr(f"INTERVAL {ATTRIB_LOOKBACK_DAYS} DAYS")
        ),
    ).select("p_id", "value", "channel", "c_ts", "c_id")
    ranked = j.select(
        "p_id",
        "value",
        "channel",
        F.row_number()
        .over(Window.partitionBy("p_id").orderBy("c_ts", "c_id"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("p_id"))
        .alias("cnt"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return ranked.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum(
            F.when(F.col("rn") == 1, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_first"),
        F.sum(
            F.when(F.col("rn") == F.col("cnt"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_last"),
        F.coalesce(
            F.sum(F.when(F.col("rn") == 1, dec("value"))), zero
        )
        .cast("double")
        .alias("first_touch_credit"),
        F.coalesce(
            F.sum(
                F.when(F.col("rn") == F.col("cnt"), dec("value"))
            ),
            zero,
        )
        .cast("double")
        .alias("last_touch_credit"),
        F.sum(
            F.round(F.col("value") / F.col("cnt"), 6).cast(
                "decimal(18,6)"
            )
        )
        .cast("double")
        .alias("linear_credit"),
    )


# ---------------------------------------------------------------------------
# Audience overlap (Jaccard between event-type user sets)
# ---------------------------------------------------------------------------


@register(
    "setops_audience_overlap_jaccard",
    oracle="""
    WITH d AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    tot AS (
        SELECT event_type, count(*) AS n_users FROM d GROUP BY 1
    ),
    pr AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(ta.n_users AS BIGINT) AS n_a,
           CAST(tb.n_users AS BIGINT) AS n_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(n_both AS DOUBLE)
               / (ta.n_users + tb.n_users - n_both) AS jaccard,
           CAST(n_both AS DOUBLE)
               / least(ta.n_users, tb.n_users) AS overlap_coef
    FROM pr
    JOIN tot ta ON ta.event_type = type_a
    JOIN tot tb ON tb.event_type = type_b
    """,
    tags=("setops", "similarity", "audience"),
)
def setops_audience_overlap_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audience overlap between every pair of event types — exact
    Jaccard |A∩B| / |A∪B| and overlap coefficient |A∩B| / min(|A|,|B|)
    over user SETS, the audience-planning readout (which behaviors
    share users?) and the exact small-domain counterpart of the
    MinHash estimate dedup_minhash_estimate_eval audits: here the
    domain (event types) is tiny so exact set intersection via
    self-join is the RIGHT plan, whereas doc-scale pairs go through
    the banded LSH kernel.  All three set sizes are exact integer
    distinct-counts; the two ratios are single divisions on them.

    Scale: the distinct (type, user) table shuffles once on user_id;
    per-user pair fan-out is bounded by |types|² (25), so the join
    output is ≤ 25× the distinct table regardless of SF — domain-
    bounded the way the Markov matrix is.  The union-size term uses
    inclusion-exclusion (n_a + n_b − n_both), never a materialized
    union."""
    d = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    tot = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a, b = d.alias("a"), d.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tot.alias("ta")
    tb = tot.alias("tb")
    return (
        both.join(
            F.broadcast(ta), F.col("ta.event_type") == F.col("type_a")
        )
        .join(
            F.broadcast(tb), F.col("tb.event_type") == F.col("type_b")
        )
        .select(
            "type_a",
            "type_b",
            F.col("ta.n_users").cast("bigint").alias("n_a"),
            F.col("tb.n_users").cast("bigint").alias("n_b"),
            F.col("n_both").cast("bigint").alias("n_both"),
            (
                F.col("n_both").cast("double")
                / (
                    F.col("ta.n_users")
                    + F.col("tb.n_users")
                    - F.col("n_both")
                )
            ).alias("jaccard"),
            (
                F.col("n_both").cast("double")
                / F.least(F.col("ta.n_users"), F.col("tb.n_users"))
            ).alias("overlap_coef"),
        )
    )


# ---------------------------------------------------------------------------
# Same-day event-type co-occurrence lift (market-basket over sessions)
# ---------------------------------------------------------------------------


@register(
    "agg_cooccurrence_lift",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type
        FROM events
    ),
    nb AS (
        SELECT count(DISTINCT (user_id, day)) AS n_baskets
        FROM baskets
    ),
    item AS (
        SELECT event_type, count(*) AS n_item FROM baskets GROUP BY 1
    ),
    pair AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_pair
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           CAST(nb.n_baskets AS BIGINT) AS n_baskets,
           CAST(n_pair AS DOUBLE) / nb.n_baskets AS support,
           CAST(n_pair AS DOUBLE) / ia.n_item AS conf_a_to_b,
           CAST(n_pair AS DOUBLE) / ib.n_item AS conf_b_to_a,
           (CAST(n_pair AS DOUBLE) * nb.n_baskets)
               / (CAST(ia.n_item AS DOUBLE) * ib.n_item) AS lift
    FROM pair
    JOIN item ia ON ia.event_type = type_a
    JOIN item ib ON ib.event_type = type_b
    CROSS JOIN nb
    """,
    tags=("agg", "association", "basket"),
)
def agg_cooccurrence_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Market-basket association over (user, day) baskets of event
    types: support n_ab/N, both conditional confidences, and lift
    (n_ab·N)/(n_a·n_b) — lift > 1 meaning the two behaviors co-occur
    in a day more than independence predicts, the association readout
    behind next-action recommendation and the Simpson-diversity /
    Markov-transition ops' cross-sectional cousin (transitions order
    WITHIN a day; this asks only joint membership).  Every count is an
    exact integer over DISTINCT basket membership (duplicates of a
    type in a day collapse first), so all four ratios are exact
    integer-to-double divisions, identical cross-engine.

    Scale: baskets = one distinct shuffle on (user, day); the pair
    join is per-basket with fan-out bounded by |types|² — the
    A-Priori candidate-pair stage with a domain-bounded item
    vocabulary, no combinatorial growth.  Item and basket totals
    broadcast (|types| rows and 1 row)."""
    baskets = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
        )
        .distinct()
    )
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ia = item.alias("ia")
    ib = item.alias("ib")
    return (
        pair.join(
            F.broadcast(ia), F.col("ia.event_type") == F.col("type_a")
        )
        .join(
            F.broadcast(ib), F.col("ib.event_type") == F.col("type_b")
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("ia.n_item").cast("bigint").alias("n_a"),
            F.col("ib.n_item").cast("bigint").alias("n_b"),
            F.col("n_baskets").cast("bigint").alias("n_baskets"),
            (F.col("n_pair").cast("double") / F.col("n_baskets")).alias(
                "support"
            ),
            (F.col("n_pair").cast("double") / F.col("ia.n_item")).alias(
                "conf_a_to_b"
            ),
            (F.col("n_pair").cast("double") / F.col("ib.n_item")).alias(
                "conf_b_to_a"
            ),
            (
                (F.col("n_pair").cast("double") * F.col("n_baskets"))
                / (
                    F.col("ia.n_item").cast("double")
                    * F.col("ib.n_item")
                )
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Time-constrained three-step funnel
# ---------------------------------------------------------------------------

#: Maximum allowed gap between consecutive funnel steps (hours).
FUNNEL_STEP_GAP_HOURS = 24


@register(
    "funnel_view_click_purchase_24h",
    oracle=f"""
    WITH fv AS (
        SELECT user_id, min(ts) AS v_ts
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    fc AS (
        SELECT fv.user_id, fv.v_ts, min(e.ts) AS c_ts
        FROM fv JOIN events e
          ON e.user_id = fv.user_id
         AND e.event_type = 'click'
         AND e.ts > fv.v_ts
         AND e.ts <= fv.v_ts + INTERVAL {FUNNEL_STEP_GAP_HOURS} HOUR
        GROUP BY 1, 2
    ),
    fp AS (
        SELECT fc.user_id, min(e.ts) AS p_ts
        FROM fc JOIN events e
          ON e.user_id = fc.user_id
         AND e.event_type = 'purchase'
         AND e.ts > fc.c_ts
         AND e.ts <= fc.c_ts + INTERVAL {FUNNEL_STEP_GAP_HOURS} HOUR
        GROUP BY 1
    )
    SELECT (SELECT count(*) FROM fv) AS n_viewed,
           (SELECT count(*) FROM fc) AS n_clicked,
           (SELECT count(*) FROM fp) AS n_purchased,
           CAST((SELECT count(*) FROM fc) AS DOUBLE)
               / (SELECT count(*) FROM fv) AS view_to_click,
           CAST((SELECT count(*) FROM fp) AS DOUBLE)
               / (SELECT count(*) FROM fc) AS click_to_purchase,
           CAST((SELECT count(*) FROM fp) AS DOUBLE)
               / (SELECT count(*) FROM fv) AS overall
    """,
    tags=("funnel", "behavioral"),
)
def funnel_view_click_purchase_24h(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Three-step TIME-CONSTRAINED funnel: first view → first
    subsequent click within {FUNNEL_STEP_GAP_HOURS} h → first
    subsequent purchase within {FUNNEL_STEP_GAP_HOURS} h of that
    click — the dashboard funnel with step-timeout semantics
    (funnel_click_to_purchase counts EVENTUAL conversion; real funnels
    expire), anchored at each user's first view so step order and
    deadlines are both enforced.  Counts are exact; the three
    conversion rates are single integer-to-double divisions.

    Scale: three user-keyed aggregates/joins, each map-side combined —
    never a time cross join; the step deadline bounds each join's
    per-user fan-out by the user's event rate × the gap.  Adding a
    step appends one more join of the same shape."""
    events = table(spark, sf_dir, "events")
    gap = F.expr(f"INTERVAL {FUNNEL_STEP_GAP_HOURS} HOURS")
    fv = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    fc = (
        fv.join(
            events.filter(F.col("event_type") == "click").select(
                F.col("user_id").alias("cu"), F.col("ts").alias("ct")
            ),
            (F.col("user_id") == F.col("cu"))
            & (F.col("ct") > F.col("v_ts"))
            & (F.col("ct") <= F.col("v_ts") + gap),
        )
        .groupBy("user_id")
        .agg(F.min("ct").alias("c_ts"))
    )
    fp = (
        fc.join(
            events.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("pu"), F.col("ts").alias("pt")
            ),
            (F.col("user_id") == F.col("pu"))
            & (F.col("pt") > F.col("c_ts"))
            & (F.col("pt") <= F.col("c_ts") + gap),
        )
        .groupBy("user_id")
        .agg(F.min("pt").alias("p_ts"))
    )
    nv = fv.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = fc.agg(F.count(F.lit(1)).alias("n_clicked"))
    np_ = fp.agg(F.count(F.lit(1)).alias("n_purchased"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            (
                F.col("n_clicked").cast("double") / F.col("n_viewed")
            ).alias("view_to_click"),
            (
                F.col("n_purchased").cast("double")
                / F.col("n_clicked")
            ).alias("click_to_purchase"),
            (
                F.col("n_purchased").cast("double")
                / F.col("n_viewed")
            ).alias("overall"),
        )
    )


# ---------------------------------------------------------------------------
# Markov-chain (removal-effect) attribution
# ---------------------------------------------------------------------------

#: Absorbing-chain state labels for the Markov attribution op.
MARKOV_START = "__START__"
MARKOV_CONV = "__CONV__"
MARKOV_NULL = "__NULL__"

#: The oracle's literal channel set (the testdata's non-purchase event
#: types, sorted — matches the engine's data-derived ``channels``).
#: The ENGINE stays fully dynamic; only the SQL oracle fixes the set,
#: the same way the AMS/attribution oracles literal 'click'/'purchase'.
MARKOV_ORACLE_CHANNELS: tuple[str, ...] = (
    "click",
    "error",
    "signup",
    "view",
)


def _gauss_solve_no_pivot(a: list[list[float]], rhs: list[float]) -> list[float]:
    """Gaussian elimination WITHOUT pivoting, fixed loop order.

    The generated oracle SQL (``_markov_oracle_sql``) performs this
    exact sequence of IEEE-754 +,-,*,/ operations, so engine and
    oracle produce bit-identical doubles (basic double ops are
    correctly rounded in CPython and DuckDB alike; no libm call is
    involved).  No pivoting is safe here: the system is I - Q for a
    substochastic Q (an M-matrix — diagonals stay positive through
    elimination)."""
    n = len(rhs)
    for k in range(n - 1):
        for i in range(k + 1, n):
            f = a[i][k] / a[k][k]
            for j in range(k + 1, n):
                a[i][j] = a[i][j] - f * a[k][j]
            rhs[i] = rhs[i] - f * rhs[k]
    x = [0.0] * n
    for i in range(n - 1, -1, -1):
        s = rhs[i]
        for j in range(i + 1, n):
            s = s - a[i][j] * x[j]
        x[i] = s / a[i][i]
    return x


def _markov_journey_cells_sql() -> str:
    """CTE chunk producing ``cells(from_state, to_state, n)`` — the
    SQL mirror of the engine's journey/transition derivation."""
    return f"""
evs AS (
    SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, event_type
    FROM events
),
fp1 AS (
    SELECT *,
           min(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id, day) AS fp_ts
    FROM evs
),
fp2 AS MATERIALIZED (
    SELECT *,
           min(CASE WHEN event_type = 'purchase' AND ts = fp_ts
                    THEN event_id END)
               OVER (PARTITION BY user_id, day) AS fp_id
    FROM fp1
),
touches AS (
    SELECT user_id, day, ts, event_id, event_type,
           fp_ts IS NOT NULL AS converted
    FROM fp2
    WHERE event_type <> 'purchase'
      AND (fp_ts IS NULL OR ts < fp_ts
           OR (ts = fp_ts AND event_id < fp_id))
),
seq AS MATERIALIZED (
    SELECT converted, event_type AS to_state,
           COALESCE(lag(event_type) OVER
                        (PARTITION BY user_id, day ORDER BY ts, event_id),
                    '{MARKOV_START}') AS from_state,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY ts DESC, event_id DESC) AS rn_last
    FROM touches
),
trans AS (
    SELECT from_state, to_state FROM seq
    UNION ALL
    SELECT to_state AS from_state,
           CASE WHEN converted THEN '{MARKOV_CONV}'
                ELSE '{MARKOV_NULL}' END AS to_state
    FROM seq WHERE rn_last = 1
    UNION ALL
    SELECT '{MARKOV_START}' AS from_state, '{MARKOV_CONV}' AS to_state
    FROM (
        SELECT user_id, day,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_p,
               sum(CASE WHEN event_type <> 'purchase'
                        AND (fp_ts IS NULL OR ts < fp_ts
                             OR (ts = fp_ts AND event_id < fp_id))
                        THEN 1 ELSE 0 END) AS n_touch
        FROM fp2 GROUP BY 1, 2
    ) WHERE has_p = 1 AND n_touch = 0
),
cells AS MATERIALIZED (
    SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
    FROM trans GROUP BY 1, 2
)"""


def _markov_oracle_sql() -> str:
    """Generate the full removal-effect oracle for the literal channel
    set: transition cells -> q entries -> five 5x5 no-pivot Gaussian
    eliminations (full chain + one per removed channel), each CTE
    stage MATERIALIZED (the r11 multiplicative-inlining gotcha), each
    arithmetic expression nested exactly as ``_gauss_solve_no_pivot``
    executes it so the doubles are bit-identical."""
    ch = MARKOV_ORACLE_CHANNELS
    states = (MARKOV_START,) + ch
    n = len(states)

    # -- one-row cell matrix: n_{i}_{j} (j>=1), n_{i}_c, n_{i}_x --
    cell_cols = []
    for i, s in enumerate(states):
        for j, t in enumerate(states[1:], start=1):
            cell_cols.append(
                f"SUM(CASE WHEN from_state = '{s}' AND to_state = '{t}'"
                f" THEN n ELSE 0 END) AS n_{i}_{j}"
            )
        cell_cols.append(
            f"SUM(CASE WHEN from_state = '{s}' AND to_state ="
            f" '{MARKOV_CONV}' THEN n ELSE 0 END) AS n_{i}_c"
        )
        cell_cols.append(
            f"SUM(CASE WHEN from_state = '{s}' AND to_state ="
            f" '{MARKOV_NULL}' THEN n ELSE 0 END) AS n_{i}_x"
        )
    m_cte = "m AS MATERIALIZED (\n    SELECT " + ",\n           ".join(
        cell_cols
    ) + "\n    FROM cells\n)"

    # -- q stage: full outdegree + transition/absorption probabilities --
    q_cols = []
    for i in range(n):
        out = " + ".join(
            [f"n_{i}_{j}" for j in range(1, n)] + [f"n_{i}_c", f"n_{i}_x"]
        )
        q_cols.append(f"({out}) AS out_{i}")
    for i in range(n):
        for j in range(1, n):
            q_cols.append(
                f"CAST(n_{i}_{j} AS DOUBLE) / CAST(out_{i} AS DOUBLE)"
                f" AS q_{i}_{j}"
            )
        q_cols.append(
            f"CAST(n_{i}_c AS DOUBLE) / CAST(out_{i} AS DOUBLE) AS rr_{i}"
        )
    nconv = " + ".join(f"n_{i}_c" for i in range(n))
    q_cte = (
        "qm AS MATERIALIZED (\n    SELECT "
        + ",\n           ".join(q_cols)
        + f",\n           CAST({nconv} AS BIGINT) AS n_conv"
        + "\n    FROM m\n)"
    )
    # NOTE on out_i referencing: DuckDB lateral column aliases let
    # q_{i}_{j} reference out_{i} defined earlier in the same SELECT.

    ctes = [m_cte, q_cte]

    # -- five solve chains: v0 = full, v{r} = channel r removed --
    p_names = []
    for v in range(n):  # v == 0 -> no removal; v == r -> remove state r
        rm = None if v == 0 else v
        tag = f"v{v}"
        # init stage
        init_cols = []
        for i in range(n):
            for j in range(n):
                base = "1.0" if i == j else "0.0"
                if rm is not None and i == rm:
                    expr = base
                elif j == 0 or (rm is not None and j == rm):
                    expr = base
                else:
                    expr = f"{base} - q_{i}_{j}"
                init_cols.append(f"{expr} AS a_{i}_{j}")
            if rm is not None and i == rm:
                init_cols.append(f"0.0 AS r_{i}")
            else:
                init_cols.append(f"rr_{i} AS r_{i}")
        ctes.append(
            f"{tag}s0 AS MATERIALIZED (\n    SELECT "
            + ",\n           ".join(init_cols)
            + "\n    FROM qm\n)"
        )
        # elimination stages k = 0..n-2
        prev = f"{tag}s0"
        for k in range(n - 1):
            cols = []
            for i in range(n):
                for j in range(n):
                    if i > k and j > k:
                        cols.append(
                            f"a_{i}_{j} - a_{i}_{k} / a_{k}_{k}"
                            f" * a_{k}_{j} AS a_{i}_{j}"
                        )
                    else:
                        cols.append(f"a_{i}_{j}")
                if i > k:
                    cols.append(
                        f"r_{i} - a_{i}_{k} / a_{k}_{k} * r_{k} AS r_{i}"
                    )
                else:
                    cols.append(f"r_{i}")
            cur = f"{tag}s{k + 1}"
            ctes.append(
                f"{cur} AS MATERIALIZED (\n    SELECT "
                + ",\n           ".join(cols)
                + f"\n    FROM {prev}\n)"
            )
            prev = cur
        # back substitution (lateral column aliases, high->low)
        back_cols = []
        for i in range(n - 1, -1, -1):
            s_expr = f"r_{i}"
            for j in range(i + 1, n):
                s_expr = f"({s_expr} - a_{i}_{j} * x{j})"
            back_cols.append(f"{s_expr} / a_{i}_{i} AS x{i}")
        p_name = f"p_{tag}"
        ctes.append(
            f"{tag}p AS MATERIALIZED (\n    SELECT "
            + ",\n           ".join(back_cols)
            + f",\n           x0 AS {p_name}\n    FROM {prev}\n)"
        )
        p_names.append(p_name)

    # -- removal effects + credit shares --
    fin_cols = [f"{p_names[0]} AS p_full", "n_conv"]
    for v in range(1, n):
        fin_cols.append(
            f"CASE WHEN {p_names[0]} > 0"
            f" THEN 1.0 - {p_names[v]} / {p_names[0]}"
            f" ELSE 0.0 END AS re_{v}"
        )
    tot = " + ".join(f"re_{v}" for v in range(1, n))
    fin_cols.append(f"{tot} AS tot_re")
    joins = " CROSS JOIN ".join([f"v{v}p" for v in range(n)] + ["qm"])
    ctes.append(
        "fin AS MATERIALIZED (\n    SELECT "
        + ",\n           ".join(fin_cols)
        + f"\n    FROM {joins}\n)"
    )

    rows = []
    for v, c in enumerate(ch, start=1):
        rows.append(
            f"SELECT '{c}' AS channel,\n"
            f"       re_{v} AS removal_effect,\n"
            f"       CASE WHEN tot_re > 0 THEN re_{v} / tot_re END"
            f" AS attribution_share,\n"
            f"       CASE WHEN tot_re > 0 THEN"
            f" CAST(n_conv AS DOUBLE) * re_{v} / tot_re END"
            f" AS attributed_conversions,\n"
            f"       p_full AS p_conversion,\n"
            f"       n_conv AS n_conversions\nFROM fin"
        )
    body = "\nUNION ALL\n".join(rows)
    return (
        "WITH "
        + _markov_journey_cells_sql().lstrip()
        + ",\n"
        + ",\n".join(ctes)
        + "\n"
        + body
    )


@register(
    "join_attribution_markov_removal",
    # Exact DuckDB oracle since r13 (the r12 verdict's "weakest
    # evidence" item): the absorbing-chain solves are mirrored as five
    # generated, MATERIALIZED CTE chains performing the engine's
    # no-pivot Gaussian elimination operation-for-operation — only
    # IEEE basic ops (correctly rounded, bit-identical across
    # engines), no libm, no rounding tolerance needed.  The oracle
    # fixes the channel set to the testdata's literal 4 non-purchase
    # event types; the engine remains data-driven.
    oracle=_markov_oracle_sql(),
    tags=("joins", "behavioral", "iterative"),
)
def join_attribution_markov_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov-chain attribution with removal effects — the
    data-driven successor to join_attribution_multitouch's positional
    heuristics (first/last/linear credit are CONVENTIONS; the removal
    effect measures each channel's causal contribution under the
    journey graph itself): build the first-order transition matrix
    over user-day journeys (START -> touches -> CONV/NULL), compute
    the chain's conversion probability p, then for each channel
    re-route its inbound edges to NULL and recompute p_c; the
    channel's removal effect is 1 - p_c/p and conversions are credited
    proportionally (Anderl et al. 2016's standard formulation).

    Journey convention (deterministic, mirrored in the test replay):
    a journey is one (user, day); touches are the day's non-purchase
    events ordered by (ts, event_id) BEFORE the first purchase; the
    journey absorbs in CONV if the day contains a purchase (a
    purchase-first day contributes START->CONV), else the full day's
    touch sequence absorbs in NULL.

    Execution: transition counting is fully distributed (the same
    lag-over-(user, day) shuffle every sequence op shares, one
    groupBy to <= (k+1)x(k+2) integer cells); ONLY the k^2-cell
    transition matrix is collected — the registry's legal sketch-sized
    driver state — and the (k+1)-dimensional linear solves run on the
    driver via a FIXED-ORDER no-pivot Gaussian elimination
    (``_gauss_solve_no_pivot``) whose operation sequence the generated
    DuckDB oracle reproduces exactly, so both engines emit
    bit-identical doubles (r13: this replaced the numpy solve — LAPACK
    op order is not mirrorable in SQL).  At 100 TB the count stage
    dominates and scales; the solve is O(k^3) for k ~ dozens of
    channels.  The oracle assumes the testdata's literal channel set
    (``MARKOV_ORACLE_CHANNELS``); the engine derives channels from the
    data."""
    evs = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )
    w_day = Window.partitionBy("user_id", "day")
    fp = F.min(
        F.when(
            F.col("event_type") == "purchase",
            F.struct("ts", "event_id"),
        )
    ).over(w_day)
    marked = evs.select(
        "user_id",
        "day",
        "ts",
        "event_id",
        "event_type",
        fp.alias("fp"),
    )
    touches = marked.filter(
        (F.col("event_type") != "purchase")
        & (
            F.col("fp").isNull()
            | (F.struct("ts", "event_id") < F.col("fp"))
        )
    )
    w_seq = Window.partitionBy("user_id", "day").orderBy(
        "ts", "event_id"
    )
    seq = touches.select(
        "user_id",
        "day",
        (F.col("fp").isNotNull()).alias("converted"),
        F.col("event_type").alias("to_state"),
        F.coalesce(
            F.lag("event_type").over(w_seq), F.lit(MARKOV_START)
        ).alias("from_state"),
        F.row_number()
        .over(
            Window.partitionBy("user_id", "day").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        )
        .alias("rn_last"),
    )
    touch_trans = seq.select("from_state", "to_state")
    terminal = seq.filter(F.col("rn_last") == 1).select(
        F.col("to_state").alias("from_state"),
        F.when(F.col("converted"), F.lit(MARKOV_CONV))
        .otherwise(F.lit(MARKOV_NULL))
        .alias("to_state"),
    )
    # purchase-first days: a conversion with no preceding touches
    empty_conv = (
        marked.groupBy("user_id", "day")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "has_p"
            ),
            F.sum(
                (
                    (F.col("event_type") != "purchase")
                    & (
                        F.col("fp").isNull()
                        | (F.struct("ts", "event_id") < F.col("fp"))
                    )
                ).cast("int")
            ).alias("n_touch"),
        )
        .filter((F.col("has_p") == 1) & (F.col("n_touch") == 0))
        .select(
            F.lit(MARKOV_START).alias("from_state"),
            F.lit(MARKOV_CONV).alias("to_state"),
        )
    )
    cells = (
        touch_trans.unionByName(terminal)
        .unionByName(empty_conv)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # <= (k+1)*(k+2) integer cells, k = #channels
    )
    counts: dict[tuple[str, str], int] = {
        (r["from_state"], r["to_state"]): int(r["n"]) for r in cells
    }
    channels = sorted(
        ({s for s, _ in counts} | {t for _, t in counts})
        - {MARKOV_START, MARKOV_CONV, MARKOV_NULL}
    )
    transient = [MARKOV_START] + channels
    t_idx = {s: i for i, s in enumerate(transient)}

    out_by_state = {
        s: sum(nn for (ss, _), nn in counts.items() if ss == s)
        for s in transient
    }

    def conv_prob(removed: str | None) -> float:
        # Build I - Q and r with the EXACT expression shapes the
        # generated oracle uses (base literal minus n/out; removed
        # state -> unit row, zeroed column, zero rhs), then solve with
        # the mirrored no-pivot elimination.
        k = len(transient)
        a: list[list[float]] = []
        rhs: list[float] = []
        for i, s in enumerate(transient):
            if s == removed:
                a.append([1.0 if j == i else 0.0 for j in range(k)])
                rhs.append(0.0)
                continue
            out = out_by_state[s]
            row = []
            for j, t in enumerate(transient):
                base = 1.0 if i == j else 0.0
                if j == 0 or t == removed or (s, t) not in counts:
                    row.append(base)
                else:
                    row.append(base - counts[(s, t)] / out)
            a.append(row)
            rhs.append(counts.get((s, MARKOV_CONV), 0) / out)
        x = _gauss_solve_no_pivot(a, rhs)
        return x[t_idx[MARKOV_START]]

    p_full = conv_prob(None)
    n_conv = sum(
        n for (_, t), n in counts.items() if t == MARKOV_CONV
    )
    res = []
    for c in channels:
        re_c = 1.0 - conv_prob(c) / p_full if p_full > 0 else 0.0
        res.append((c, re_c))
    tot_re = sum(re for _, re in res)
    out_rows = [
        (
            c,
            float(re),
            float(re / tot_re) if tot_re > 0 else None,
            float(n_conv * re / tot_re) if tot_re > 0 else None,
            float(p_full),
            int(n_conv),
        )
        for c, re in res
    ]
    return spark.createDataFrame(
        out_rows,
        "channel string, removal_effect double, "
        "attribution_share double, attributed_conversions double, "
        "p_conversion double, n_conversions bigint",
    )


# ---------------------------------------------------------------------------
# Apriori frequent triples
# ---------------------------------------------------------------------------

#: Minimum support for the Apriori op, as an exact integer
#: cross-product: support*20 >= n_baskets  (i.e. 5% of baskets).
APRIORI_MIN_SUPPORT_X20 = 20


@register(
    "agg_apriori_frequent_triples",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    nb AS (
        SELECT count(*) AS n FROM (
            SELECT DISTINCT user_id, day FROM items
        )
    )
    SELECT a.event_type AS item_a,
           b.event_type AS item_b,
           c.event_type AS item_c,
           CAST(count(*) AS BIGINT) AS support_count,
           CAST(count(*) AS DOUBLE) / any_value(nb.n) AS support_frac
    FROM items a
    JOIN items b ON b.user_id = a.user_id AND b.day = a.day
                AND a.event_type < b.event_type
    JOIN items c ON c.user_id = a.user_id AND c.day = a.day
                AND b.event_type < c.event_type
    CROSS JOIN nb
    GROUP BY 1, 2, 3
    HAVING count(*) * {APRIORI_MIN_SUPPORT_X20} >= any_value(nb.n)
    """,
    tags=("behavioral", "statistics"),
)
def agg_apriori_frequent_triples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frequent event-type TRIPLES over (user, day) baskets by honest
    level-wise Apriori — the market-basket step beyond
    agg_cooccurrence_lift's pairs, run with the real algorithm: L1
    (frequent items) prunes the pair candidates, L2 (frequent pairs)
    prunes the triple candidates via ALL THREE sub-pairs before any
    triple is counted — the downward-closure property that makes
    frequent-itemset mining feasible when the item domain is large.
    The ORACLE is the opposite algorithm (brute-force triple count
    with a HAVING) — Apriori's output must equal it exactly, which is
    precisely the property the pruning must preserve.  Support is the
    exact integer cross-product count*20 >= n_baskets (5%).

    Scale: each level is one semi-join against the previous level's
    (item-domain-sized, broadcast) survivors followed by a
    map-side-combined groupBy — the candidate set never outgrows the
    frequent-set closure, which is the algorithm's entire point; the
    basket table shuffles once on (user, day)."""
    items = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "event_type",
        )
        .distinct()
    )
    n_baskets = items.select("user_id", "day").distinct().count()
    thr = lambda cnt: cnt * APRIORI_MIN_SUPPORT_X20 >= F.lit(  # noqa: E731
        n_baskets
    )
    l1 = (
        items.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(thr(F.col("c")))
        .select(F.col("event_type").alias("item"))
    )
    pruned1 = items.join(
        F.broadcast(l1), items["event_type"] == l1["item"], "left_semi"
    )
    a, b = pruned1.alias("a"), pruned1.alias("b")
    pair_base = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.day").alias("day"),
        F.col("a.event_type").alias("i1"),
        F.col("b.event_type").alias("i2"),
    )
    l2 = (
        pair_base.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(thr(F.col("c")))
        .select("i1", "i2")
    )
    # candidate triples: extend frequent pairs by a third frequent
    # item, then Apriori-prune on ALL sub-pairs before counting
    t = pair_base.alias("p").join(
        pruned1.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("p.day") == F.col("c.day"))
        & (F.col("p.i2") < F.col("c.event_type")),
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.day").alias("day"),
        F.col("p.i1").alias("i1"),
        F.col("p.i2").alias("i2"),
        F.col("c.event_type").alias("i3"),
    )
    l2_12 = l2.select(
        F.col("i1").alias("j1"), F.col("i2").alias("j2")
    )
    t = t.join(
        F.broadcast(l2_12),
        (F.col("i1") == F.col("j1")) & (F.col("i2") == F.col("j2")),
        "left_semi",
    )
    t = t.join(
        F.broadcast(l2_12),
        (F.col("i1") == F.col("j1")) & (F.col("i3") == F.col("j2")),
        "left_semi",
    )
    t = t.join(
        F.broadcast(l2_12),
        (F.col("i2") == F.col("j1")) & (F.col("i3") == F.col("j2")),
        "left_semi",
    )
    return (
        t.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support_count"))
        .filter(thr(F.col("support_count")))
        .select(
            F.col("i1").alias("item_a"),
            F.col("i2").alias("item_b"),
            F.col("i3").alias("item_c"),
            F.col("support_count").cast("bigint").alias(
                "support_count"
            ),
            (
                F.col("support_count").cast("double")
                / F.lit(n_baskets)
            ).alias("support_frac"),
        )
    )
