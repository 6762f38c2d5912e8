"""Physical-planning invariance: results must be BYTE-IDENTICAL under
adversarial engine configs (tiny shuffle partition counts, broadcast
joins disabled, AQE off) — the determinism contract that makes a 100 TB
backfill auditable.  Any operator whose output depends on partitioning,
join strategy, or adaptive re-planning fails here before it fails in
production.
"""

from __future__ import annotations

import pytest

from kafka_stream_processing_spark import registry

#: Representative of every physically-distinct plan family: broadcast
#: star join, de-correlated window self-join, multi-stage hash dedup,
#: ranking window, de-correlated threshold join-back, stateless hash map,
#: grouped-agg pandas UDF, SQL-front-end lateral.
QUERIES = (
    "q5_region_revenue",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "window_topk_orders_per_customer",
    "q17_small_quantity_revenue",
    "sample_hash_split",
    "pandas_grouped_agg_value_sum",
    "sql_lateral_topk_per_customer",
    # r04: PQ encode/rank — multi-codebook broadcast compose + ranking
    # window; the decimal ADC sums must survive any join strategy.
    "similarity_pq_adc_topk",
    # r08: the two new pair-kernel families — the grid cross join
    # (distance correlation) and the cell dominance join (Hoeffding)
    # must deliver the same exact BIGINT components when broadcasts
    # are disabled and the shuffle is squeezed to 3 partitions.
    "quality_distance_correlation_hourly",
    "quality_hoeffding_d_hourly",
)

#: NOTE: no adaptive.enabled=false here — the registry wrapper
#: (ensure_runtime_conf) re-asserts AQE on every query as a
#: semantics-neutral engine default, so flipping it off in a test is
#: silently reverted.  Partition count and broadcast strategy are NOT
#: re-asserted, so these two genuinely vary the physical plan.
ADVERSARIAL = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _rows(spark, name, sf):
    df = registry.all_specs()[name].fn(spark, sf)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_results_invariant_under_adversarial_planning(spark, sf_small, name):
    baseline = _rows(spark, name, sf_small)
    saved = {k: spark.conf.get(k, None) for k in ADVERSARIAL}
    try:
        for k, v in ADVERSARIAL.items():
            spark.conf.set(k, v)
        adversarial = _rows(spark, name, sf_small)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert adversarial == baseline
