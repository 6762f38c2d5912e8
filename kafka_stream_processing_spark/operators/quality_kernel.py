"""Shared kernel for the quality-operator families: the chi-squared
critical-value SQL (Wilson-Hilferty beyond the lookup table), the
normal critical value, the k-anonymity bucketing width, and the
reference-vs-source value-histogram builder that every two-sample
drift test walks.

Extracted from the original single-module quality.py (r09 split) so
each family module imports ONE copy — the shared-kernel guards in
tests/ pin that batch and streaming callers run the same text.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.sources.tables import table


#: Upper-tail chi-squared critical values at alpha = 0.05 by degrees of
#: freedom (literals, so both engines compare against identical doubles).
#: Standard published table through dof=30; beyond it both engines fall
#: back to the Wilson-Hilferty cube approximation (below) so the drift
#: gate NEVER returns a NULL verdict — a gate that silently stops gating
#: when the category count grows is worse than a slightly approximate
#: threshold.
CHI2_CRIT_005 = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
                 6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307,
                 11: 19.675, 12: 21.026, 13: 22.362, 14: 23.685,
                 15: 24.996, 16: 26.296, 17: 27.587, 18: 28.869,
                 19: 30.144, 20: 31.410, 21: 32.671, 22: 33.924,
                 23: 35.172, 24: 36.415, 25: 37.652, 26: 38.885,
                 27: 40.113, 28: 41.337, 29: 42.557, 30: 43.773}


#: z_{0.95} for the Wilson-Hilferty fallback (dof > 30):
#: crit = dof * b^3 with b = 1 - 2/(9*dof) + z*sqrt(2/(9*dof)).
#: The cube is spelled b*b*b (not pow) and sqrt/divide are IEEE
#: correctly-rounded, so the fallback is bit-identical cross-engine
#: just like the literal table.
_WH_Z095 = 1.6448536269514722


_WH_B_SQL = (
    f"(1 - 2.0 / (9 * dof) + {_WH_Z095} * sqrt(2.0 / (9 * dof)))"
)


_CHI2_CRIT_SQL = "CASE " + " ".join(
    f"WHEN dof = {k} THEN {v}" for k, v in CHI2_CRIT_005.items()
) + f" ELSE dof * {_WH_B_SQL} * {_WH_B_SQL} * {_WH_B_SQL} END"


# ---------------------------------------------------------------------------
# Privacy and skew audits
# ---------------------------------------------------------------------------

#: k-anonymity bands: a group's size k determines its re-identification
#: risk class.  Frontiers are the conventional k=5 / k=20 policy cuts.
KANON_BUCKET_CHARS = 100


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------

#: Two-sided z critical value at alpha = 0.05.
Z_CRIT_005 = 1.959963984540054


# ---------------------------------------------------------------------------
# K-sample / effect-size completion of the drift family
# ---------------------------------------------------------------------------

#: Shared two-sample (src0 vs each other source) value histogram — the
#: kernel under quality_mannwhitney_drift, quality_cliffs_delta_effect
#: and quality_hodges_lehmann_shift's pair weighting: one row per
#: (source s, distinct value v) with the reference count `a` and the
#: source count `b`.  Histogram-sized, never corpus-sized.
def _ref_vs_source_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    srcs = (
        x.filter(F.col("source") != "src0")
        .select(F.col("source").alias("s"))
        .distinct()
    )
    ref_hist = (
        x.filter(F.col("source") == "src0")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    src_hist = (
        x.filter(F.col("source") != "src0")
        .groupBy(F.col("source").alias("s"), "v")
        .agg(F.count(F.lit(1)).alias("b"))
    )
    return (
        src_hist.select("s", "v", F.lit(0).cast("bigint").alias("a"), "b")
        .unionByName(
            srcs.crossJoin(F.broadcast(ref_hist)).select(
                "s", "v", "a", F.lit(0).cast("bigint").alias("b")
            )
        )
        .groupBy("s", "v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )

