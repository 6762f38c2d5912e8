"""Bucketed-table co-located join: the 100 TB layout strategy for the
engine's hottest join (orders ⋈ lineitem).  Writing both fact tables
bucketed by the join key lets Spark plan a SortMergeJoin with ZERO
exchanges — the shuffle happened once at write time and is amortized over
every subsequent join (SCALE.md "Scan layer")."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kafka_stream_processing_spark.plans.explain import plan_report
from kafka_stream_processing_spark.sources.tables import table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    # Warehouse dir is a static conf — set to /tmp by the session factory.
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    (
        table(spark, sf_small, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bktest.orders_b")
    )
    (
        table(spark, sf_small, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bktest.lineitem_b")
    )
    yield "bktest.orders_b", "bktest.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, sf_small):
    orders_b, lineitem_b = bucketed_tables
    # At sf0.001 both sides are broadcast-sized, which hides the layout
    # property under test; force the shuffle-join path a 100 TB fact⋈fact
    # join would take.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        _run_bucketed_assertions(spark, orders_b, lineitem_b, sf_small)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # A previously-UNSET conf must be unset again, not left at -1:
        # `if prev_aqe:` leaked the adaptive threshold to every later
        # test in the session (observed: degraded a bounded range join
        # to CartesianProduct in a test_plans pin, r13).
        if prev_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe
            )
        else:
            spark.conf.unset(
                "spark.sql.adaptive.autoBroadcastJoinThreshold"
            )


def _run_bucketed_assertions(spark, orders_b, lineitem_b, sf_small):
    o = spark.table(orders_b)
    li = spark.table(lineitem_b)
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rep = plan_report(joined)
    # The join itself must not exchange either side: bucket layout already
    # co-locates matching keys.  (The post-join groupBy aggregation is
    # allowed its one exchange.)
    join_section = rep.text.split("HashAggregate")[0]
    assert "SortMergeJoin" in rep.text or "ShuffledHashJoin" in rep.text, rep.text[:3000]
    exchanges_feeding_join = len(re.findall(r"\(\d+\) Exchange", join_section))
    assert exchanges_feeding_join == 0, rep.text[:4000]

    # And the result matches the plain-parquet join.
    plain = (
        table(spark, sf_small, "lineitem")
        .join(table(spark, sf_small, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
