"""Measure-first (guide §1): engine-side wall for the unrolled iterative
ops the r14 verdict flagged (item 3) plus the PCA family (item 4), at
sf0.01 (the sweep's SF) — noop-forcing where the op returns a real frame.
Run on a quiet box; each op timed cold-plan (fresh call) twice, report both.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from kafka_stream_processing_spark import registry  # noqa: E402
from kafka_stream_processing_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROF_SF", "/root/testdata/sf0.01")
OPS = sys.argv[1:] or [
    "retrieval_mmr_rerank",
    "dedup_entity_resolution_parts",
    "sample_kcenter_coreset",
    "embedding_top_pc_power_iteration",
    "embedding_pca_deflation_top3",
    "embedding_pca_block_iteration_top3",
]

spark = get_spark("iter-profile")
spark.sparkContext.setLogLevel("ERROR")
specs = registry.all_specs()

# warm the session: JVM, parquet footers
specs["unique_users_per_minute"].fn(spark, SF).count()

for name in OPS:
    times = []
    for i in range(2):
        spark.sparkContext.setJobDescription(f"{name} pass {i}")
        t0 = time.perf_counter()
        df = specs[name].fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: {times}", flush=True)
