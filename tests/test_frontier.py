"""Exact-vs-production frontier agreement (VERDICT r06 item 2/3).

Every corpus-scale unpartitioned ``Window.orderBy`` in the engine now
has an IMPLEMENTED distributed path (operators/frontier.py).  These
tests pin, at test scale, that the production path agrees with the
oracle-checked exact form:

* bit-identical where the math guarantees it (gini histogram form,
  distributed global rank, TextRank TakeOrderedAndProject cut), and
* keep-set/bucket agreement elsewhere, with any disagreement allowed
  ONLY for rows whose value EQUALS a cut value (value semantics keep
  boundary ties together; the rank form splits them by id tiebreak).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_stream_processing_spark.operators.frontier import (
    global_rank,
    quantile_cuts,
)


def test_quantile_cuts_exact_median_matches_lower_median(spark, sf_small):
    from kafka_stream_processing_spark.sources.tables import table

    d = table(spark, sf_small, "documents").select("doc_id", "n_chars")
    exact = quantile_cuts(d, "n_chars", [(1, 2)], mode="exact").collect()
    vals = sorted(r["n_chars"] for r in d.collect())
    n = len(vals)
    assert exact[0]["cut_0"] == vals[(n + 1) // 2 - 1]


def test_quantile_cuts_approx_is_exact_at_test_scale(spark, sf_small):
    # accuracy >> n, so the GK sketch returns a true order statistic
    # within rank error < 1 — i.e. the exact cut or its rank-neighbor.
    from kafka_stream_processing_spark.sources.tables import table

    d = table(spark, sf_small, "documents").select("doc_id", "n_chars")
    vals = sorted(r["n_chars"] for r in d.collect())
    n = len(vals)
    approx = quantile_cuts(
        d, "n_chars", [(1, 2), (4, 5)], mode="approx"
    ).collect()[0]
    lo_med = vals[(n + 1) // 2 - 1]
    assert approx["cut_0"] in (lo_med, vals[min((n + 1) // 2, n - 1)])
    r80 = (n * 4 + 4) // 5
    assert approx["cut_1"] in (vals[r80 - 1], vals[min(r80, n - 1)])


def test_global_rank_distributed_bit_identical(spark, sf_small):
    from kafka_stream_processing_spark.sources.tables import table

    cnt = (
        table(spark, sf_small, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    order = [F.desc("c"), F.col("w")]
    exact = {
        r["w"]: r["r"]
        for r in global_rank(cnt, order, mode="exact").collect()
    }
    dist = {
        r["w"]: r["r"]
        for r in global_rank(cnt, order, mode="distributed").collect()
    }
    assert dist == exact and len(exact) > 20


def test_dsir_approx_keepset_agrees_off_boundary(spark, sf_small):
    from kafka_stream_processing_spark.operators.pipeline import (
        sample_dsir_importance,
    )

    exact = {
        r["doc_id"]: (r["log_weight"], r["selected"])
        for r in sample_dsir_importance(spark, sf_small).collect()
    }
    approx = {
        r["doc_id"]: (r["log_weight"], r["selected"])
        for r in sample_dsir_importance(
            spark, sf_small, frontier="approx"
        ).collect()
    }
    assert set(exact) == set(approx)
    # the approx cut value = min selected weight under value semantics
    cut = min(w for w, sel in approx.values() if sel)
    diff = [
        doc
        for doc in exact
        if exact[doc][1] != approx[doc][1]
    ]
    for doc in diff:
        assert exact[doc][0] == cut, (
            f"{doc} disagrees away from the cut value"
        )
    # and the disagreement set is a tiny boundary sliver
    assert len(diff) <= max(5, len(exact) // 100)


def test_mad_approx_output_matches_exact(spark, sf_small):
    from kafka_stream_processing_spark.operators.quality_audit import (
        quality_length_outlier_mad,
    )

    exact = {
        r["doc_id"]: (r["median_chars"], r["mad"], r["is_outlier"])
        for r in quality_length_outlier_mad(spark, sf_small).collect()
    }
    approx = {
        r["doc_id"]: (r["median_chars"], r["mad"], r["is_outlier"])
        for r in quality_length_outlier_mad(
            spark, sf_small, frontier="approx"
        ).collect()
    }
    # medians may sit one rank apart (GK upper-vs-lower median pick);
    # the OUTLIER VERDICTS must agree except where |ad - 3*mad| flips
    # by that one-rank median shift — on this corpus they agree fully
    # or the medians are identical.  Assert the strong invariant that
    # holds for the actual data: identical medians => identical output.
    med_e = next(iter(exact.values()))[:2]
    med_a = next(iter(approx.values()))[:2]
    if med_e == med_a:
        assert exact == approx
    else:
        # one-rank neighbor at most
        assert abs(med_e[0] - med_a[0]) <= 1 or abs(med_e[1] - med_a[1]) <= 1


def test_rfm_approx_buckets_differ_only_at_cut_values(spark, sf_small):
    from kafka_stream_processing_spark.operators.windowed import (
        window_rfm_segmentation,
    )

    exact = {
        r["c_custkey"]: r
        for r in window_rfm_segmentation(spark, sf_small).collect()
    }
    approx = {
        r["c_custkey"]: r
        for r in window_rfm_segmentation(
            spark, sf_small, frontier="approx"
        ).collect()
    }
    assert set(exact) == set(approx)
    # A flip can come from (a) a tie group straddling the exact rank
    # boundary (value semantics keep it together) or (b) the GK
    # sketch's cut landing one rank off the engine's ceil convention.
    # Either way the flip is ±1 bucket and confined to customers whose
    # exact RANK sits within the tie-group-or-one of a tercile
    # boundary — never a systematic shift.
    n = len(exact)
    for metric, bcol, desc in (
        ("recency_days", "r_bucket", False),
        ("frequency", "f_bucket", True),
        ("monetary", "m_bucket", True),
    ):
        ordered = sorted(
            exact.values(),
            key=lambda r: (
                (-r[metric] if desc else r[metric]),
                r["c_custkey"],
            ),
        )
        rank_of = {
            r["c_custkey"]: i + 1 for i, r in enumerate(ordered)
        }
        b1, b2 = n // 3, (2 * n) // 3  # exact boundary ranks
        flips = 0
        for key, e in exact.items():
            a = approx[key]
            if e[bcol] == a[bcol]:
                continue
            flips += 1
            assert abs(e[bcol] - a[bcol]) == 1, (
                f"{metric}: bucket jumped by >1 for custkey {key}"
            )
            # boundary neighborhood: rank within the tie group that
            # contains a boundary, or adjacent to it
            v = e[metric]
            tie_ranks = [
                rank_of[k]
                for k, o in exact.items()
                if o[metric] == v
            ]
            lo, hi = min(tie_ranks) - 1, max(tie_ranks) + 1
            assert any(lo <= b <= hi for b in (b1, b2)), (
                f"{metric}: custkey {key} (rank {rank_of[key]}) flips "
                f"away from both boundaries {b1}/{b2}"
            )
        # allowed flip volume: the tie groups that CONTAIN a boundary
        # rank (they flip wholesale under value semantics) plus a ±2
        # one-rank-sketch sliver per boundary
        allowed = 4
        for b in (b1, b2):
            if 1 <= b <= n:
                bv = ordered[b - 1][metric]
                allowed += sum(
                    1 for r in ordered if r[metric] == bv
                )
        assert flips <= allowed, (
            f"{metric}: {flips} flips > allowed {allowed}"
        )


def test_gini_histogram_bit_identical(spark, sf_small):
    from kafka_stream_processing_spark.operators.quality_audit import (
        quality_key_skew_gini,
    )

    exact = quality_key_skew_gini(spark, sf_small).collect()[0]
    hist = quality_key_skew_gini(
        spark, sf_small, frontier="histogram"
    ).collect()[0]
    assert exact.asDict() == hist.asDict()


def test_zipf_distributed_bit_identical(spark, sf_small):
    from kafka_stream_processing_spark.operators.text import (
        text_zipf_rank_frequency,
    )

    # r13: the DEFAULT is the distributed form; request the exact
    # single-window form explicitly for the bit-identity pin.
    exact = text_zipf_rank_frequency(
        spark, sf_small, rank_mode="exact"
    ).collect()[0]
    dist = text_zipf_rank_frequency(spark, sf_small).collect()[0]
    assert exact.asDict() == dist.asDict()


def test_textrank_topk_plan_uses_take_ordered(spark, sf_small):
    from kafka_stream_processing_spark.operators.graph import (
        text_keyword_textrank,
    )

    df = text_keyword_textrank(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_zipf_distributed_rank_window_is_partitioned(spark, sf_small):
    """Plan pin for the production rank path: the exact form's
    row_number window has an EMPTY partition spec (single-task sort);
    the distributed form's is partitioned by spark_partition_id — no
    unpartitioned corpus-scale window survives in mode='distributed'.
    (The remaining Exchange SinglePartition in both plans is the final
    4-moment SCALAR aggregate — one row, legal.)"""
    from kafka_stream_processing_spark.operators.text import (
        text_zipf_rank_frequency,
    )

    exact = text_zipf_rank_frequency(spark, sf_small, rank_mode="exact")
    exact.collect()
    p_exact = exact._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(c#" in p_exact.replace("\n", " ") or (
        "windowspecdefinition(" in p_exact
    )
    # r13: distributed is now the DEFAULT (driver-checked) path.
    dist = text_zipf_rank_frequency(spark, sf_small)
    dist.collect()
    p_dist = dist._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_pid" in p_dist
    # and the exact plan's window is genuinely unpartitioned
    import re

    specs = re.findall(r"windowspecdefinition\(([^,]+)", p_exact)
    assert all(s.startswith("c#") for s in specs), specs


def test_lorenz_approx_matches_exact_up_to_boundary_ties(
    spark, sf_small
):
    """VERDICT r07 item 3: the Lorenz curve's frontier="approx" path
    (nine percentile_approx decile edges + broadcast bucket assign)
    must agree with the exact ntile form up to boundary-tie semantics:
    the approx CUMULATIVE decile population must equal the count of
    customers at-or-below some value in the one-rank neighborhood of
    the exact decile boundary rank (value semantics keep a tie group
    together; ntile splits it by custkey), and totals must be
    preserved exactly."""
    from kafka_stream_processing_spark.operators.windowed import (
        LORENZ_BUCKETS,
        window_lorenz_curve_customers,
    )
    from kafka_stream_processing_spark.sources.tables import table

    exact = window_lorenz_curve_customers(spark, sf_small).collect()
    approx = window_lorenz_curve_customers(
        spark, sf_small, frontier="approx"
    ).collect()

    n_e = sum(r["n_customers"] for r in exact)
    n_a = sum(r["n_customers"] for r in approx)
    assert n_e == n_a
    assert sum(r["revenue"] for r in exact) == pytest.approx(
        sum(r["revenue"] for r in approx), rel=1e-12
    )
    for rows in (exact, approx):
        last = max(rows, key=lambda r: r["decile"])
        assert last["cum_share"] == pytest.approx(1.0, abs=1e-12)
        shares = [r["cum_share"] for r in sorted(rows, key=lambda r: r["decile"])]
        assert shares == sorted(shares)

    # Reconstruct the per-customer revenue multiset and check the
    # approx cumulative populations against the one-rank-neighborhood
    # tie-group bound.
    cust = table(spark, sf_small, "customer").select("c_custkey")
    orders = table(spark, sf_small, "orders")
    rev_rows = (
        cust.join(
            orders,
            cust["c_custkey"] == orders["o_custkey"],
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")),
                F.lit(0).cast("decimal(18,6)"),
            ).alias("r")
        )
        .collect()
    )
    vals = sorted(r["r"] for r in rev_rows)
    n = len(vals)
    assert n == n_e
    cum_a = {}
    running = 0
    for r in sorted(approx, key=lambda r: r["decile"]):
        running += r["n_customers"]
        cum_a[r["decile"]] = running
    for d in range(1, LORENZ_BUCKETS):
        if d not in cum_a:
            continue
        b = (n * d + LORENZ_BUCKETS - 1) // LORENZ_BUCKETS  # ceil rank
        allowed = set()
        for rank in (b - 1, b, b + 1):
            if 1 <= rank <= n:
                v = vals[rank - 1]
                allowed.add(sum(1 for x in vals if x <= v))
        assert cum_a[d] in allowed, (
            f"decile {d}: cumulative {cum_a[d]} not in {sorted(allowed)}"
        )
