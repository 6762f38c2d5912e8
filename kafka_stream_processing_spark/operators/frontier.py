"""Rank frontiers and total-order ranks: the exact single-task forms
(oracle path) beside their distributed production forms (VERDICT r06
item 2).

Several operators cut a corpus-scale table at an integer rank frontier
— "top 20% by weight" (sample_dsir_importance), "lower median"
(quality_length_outlier_mad), "terciles" (window_rfm_segmentation) —
or need a full total-order rank (text_zipf_rank_frequency,
quality_key_skew_gini).  The exact forms use an unpartitioned
``Window.orderBy``: bit-reproducible and DuckDB-mirrorable, but every
row funnels through ONE task — the single-partition-sort scale-killer
at 100 TB.  This module provides the drop-in production paths:

* :func:`quantile_cuts` — ``mode="approx"`` routes through
  ``percentile_approx`` (Greenwald-Khanna sketch: map-side built,
  mergeable, never a total-order sort); ``mode="exact"`` computes the
  same cuts as integer-rank order statistics (the oracle convention).
* :func:`global_rank` — ``mode="distributed"`` computes an EXACT
  1-based total-order rank with ``repartitionByRange`` + per-partition
  local ranks + prefix offsets (two narrow passes, ≤ one partition of
  data per task); ``mode="exact"`` is the single-window form.

tests/test_frontier.py pins exact≡approx agreement (and, where value
ties straddle a cut, that any bucket disagreement happens ONLY at a
cut value) at test scale.  Oracle entries stay on the exact forms —
the approx path is the documented 100 TB swap, now code instead of
prose.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: percentile_approx accuracy: rank error <= n / accuracy, so at test
#: scale (n << accuracy) the sketch returns an exact order statistic;
#: at 100 TB the same setting bounds relative rank error at 1e-5 with
#: O(accuracy) sketch state per aggregate — independent of n.
FRONTIER_ACCURACY = 100_000


def _frac(q: float | tuple[int, int]) -> Fraction:
    if isinstance(q, tuple):
        return Fraction(q[0], q[1])
    return Fraction(q).limit_denominator(1_000_000)


def quantile_cuts(
    df: DataFrame,
    col: str,
    qs: Sequence[float | tuple[int, int]],
    mode: str = "exact",
    tiebreak: str | None = None,
    accuracy: int = FRONTIER_ACCURACY,
) -> DataFrame:
    """ONE-ROW DataFrame with columns ``cut_0..cut_{k-1}``: the value
    of ``col`` at each quantile fraction in ``qs``.

    ``mode="exact"``: the lower order statistic at integer rank
    ``ceil(q*n)`` (``(n*num + den - 1) div den`` — all-integer, the
    lower-median convention of quality_length_outlier_mad), computed
    with one total-order sort.  Oracle path; test scale only.

    ``mode="approx"``: one ``percentile_approx`` aggregate — GK
    sketch, built map-side and merged, no total-order sort; this is
    the production path (broadcast the 1-row result and filter, same
    downstream table shape).

    Fractions may be given as ``(num, den)`` tuples to keep the exact
    rank arithmetic integral.
    """
    fracs = [_frac(q) for q in qs]
    if mode == "approx":
        return df.agg(
            *[
                F.percentile_approx(
                    col, float(fr), F.lit(accuracy)
                ).alias(f"cut_{i}")
                for i, fr in enumerate(fracs)
            ]
        )
    if mode != "exact":
        raise ValueError(f"quantile_cuts: unknown mode {mode!r}")
    order = [F.col(col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.orderBy(*order)
    wn = Window.partitionBy()
    ranked = df.select(
        F.col(col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    picks = None
    for i, fr in enumerate(fracs):
        rank_expr = (
            f"(_n * {fr.numerator} + {fr.denominator - 1}) "
            f"div {fr.denominator}"
        )
        p = ranked.filter(
            F.col("_rn") == F.greatest(F.lit(1), F.expr(rank_expr))
        ).select(F.col("_v").alias(f"cut_{i}"))
        picks = p if picks is None else picks.crossJoin(p)
    return picks


def global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    mode: str = "exact",
    rank_name: str = "r",
) -> DataFrame:
    """``df`` plus a 1-based total-order ``rank_name`` column over
    ``order_cols`` (which must be a tie-free composite key, as every
    caller's rank convention already requires).

    ``mode="exact"``: one unpartitioned ``Window.orderBy`` — a single
    total-order sort task.  Oracle path.

    ``mode="distributed"``: the classic two-phase exact global rank —
    ``repartitionByRange`` on the sort key (range-partitioned, so
    partition i's rows all precede partition i+1's), pin the layout
    with an eager ``localCheckpoint`` (range boundaries are sampled;
    pinning makes the prefix offsets and the ranking pass see the SAME
    partitioning), then per-partition ``row_number`` plus broadcast
    prefix offsets from a ≤ numPartitions-row count collect (a legal
    scalar-sized collect).  No task ever sorts more than one
    partition; result is BIT-IDENTICAL to the exact form.
    """
    cols = list(order_cols)
    if mode == "exact":
        return df.withColumn(
            rank_name, F.row_number().over(Window.orderBy(*cols))
        )
    if mode != "distributed":
        raise ValueError(f"global_rank: unknown mode {mode!r}")
    from kafka_stream_processing_spark.session import default_parallelism

    n_part = default_parallelism()
    part = (
        df.repartitionByRange(n_part, *cols)
        .localCheckpoint(eager=True)
    )
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in with_pid.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    offset_expr = F.lit(0)
    for pid, off in offsets.items():
        if off:
            offset_expr = F.when(
                F.col("_pid") == pid, F.lit(off)
            ).otherwise(offset_expr)
    local = Window.partitionBy("_pid").orderBy(*cols)
    return (
        with_pid.withColumn("_lrn", F.row_number().over(local))
        .withColumn(rank_name, (offset_expr + F.col("_lrn")).cast("int"))
        .drop("_pid", "_lrn")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[Column],
    value_col: str,
    mode: str = "exact",
    sum_name: str = "cum",
) -> DataFrame:
    """``df`` plus a running total ``sum_name`` of ``value_col`` over
    the total order given by ``order_cols`` (a tie-free composite key).

    ``mode="exact"``: one unpartitioned cumulative ``Window.orderBy``
    — the oracle path, single sort task.

    ``mode="distributed"``: the two-phase form of :func:`global_rank`
    extended to prefix SUMS — ``repartitionByRange`` on the sort key,
    eager ``localCheckpoint`` to pin the sampled range boundaries,
    per-partition cumulative window, plus broadcast PARTITION-TOTAL
    prefix offsets from a ≤ numPartitions-row collect.  Exactness
    requires the value column to sum associatively without drift —
    callers pass DECIMAL (exact) values, never raw doubles.  Result is
    bit-identical to the exact form; no task sorts more than one
    partition."""
    cols = list(order_cols)
    if mode == "exact":
        w = Window.orderBy(*cols).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(sum_name, F.sum(value_col).over(w))
    if mode != "distributed":
        raise ValueError(f"global_prefix_sum: unknown mode {mode!r}")
    from kafka_stream_processing_spark.session import default_parallelism

    n_part = default_parallelism()
    part = (
        df.repartitionByRange(n_part, *cols)
        .localCheckpoint(eager=True)
    )
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    totals = sorted(
        (r["_pid"], r["s"])
        for r in with_pid.groupBy("_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    offsets, acc = {}, None
    for pid, s in totals:
        offsets[pid] = acc
        acc = s if acc is None else acc + s
    offset_expr = None
    for pid, off in offsets.items():
        cond = F.col("_pid") == pid
        val = F.lit(off) if off is not None else F.lit(0)
        offset_expr = (
            F.when(cond, val)
            if offset_expr is None
            else offset_expr.when(cond, val)
        )
    local = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.withColumn("_lcs", F.sum(value_col).over(local))
        .withColumn(sum_name, offset_expr + F.col("_lcs"))
        .drop("_pid", "_lcs")
    )
