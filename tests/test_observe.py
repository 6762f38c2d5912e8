"""In-flight metric observation (`df.observe`): data-quality counters
that ride the SAME action as the query — no second scan.  At 100 TB a
pipeline cannot afford a separate validation pass per batch; observe
attaches accumulator-style aggregates to the existing job, which is how
the engine’s quality rules (operators/quality_*.py) deploy in production
streams (`StreamingQueryListener` surfaces the same metrics per batch).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from kafka_stream_processing_spark.sources.tables import table

SF_DIR = "/root/testdata/sf0.001"


def test_observe_rides_single_action(spark):
    li = table(spark, SF_DIR, "lineitem")
    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_discount") > 0.1, 1).otherwise(0)).alias(
            "discount_violations"
        ),
        F.min("l_quantity").alias("min_qty"),
    )
    # One action drives both the query result and the metrics.
    result = (
        observed.groupBy("l_returnflag").count().orderBy("l_returnflag").collect()
    )
    got = obs.get

    assert got["n_rows"] == li.count()
    assert got["n_rows"] == sum(r["count"] for r in result)
    assert got["discount_violations"] == li.filter(F.col("l_discount") > 0.1).count()
    assert got["min_qty"] == 1.0


def test_observe_on_filtered_stage(spark):
    """Metrics observe the stage they are attached to — post-filter here,
    so the counter sees only surviving rows (the contract a pipeline
    relies on when auditing each transformation step)."""
    o = table(spark, SF_DIR, "orders")
    obs = Observation("post_filter")
    filtered = o.filter(F.col("o_orderstatus") == "O").observe(
        obs, F.count(F.lit(1)).alias("n_after")
    )
    n = filtered.count()
    assert obs.get["n_after"] == n
    assert n < o.count()
