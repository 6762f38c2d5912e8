"""Round-5 operator pins: trained-codebook reproduction, PQ-family
recall vs exact ground truth, OPQ allocation structure, residual-PQ cell
containment, DoReMi weight invariants."""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.operators import _codebooks as cbmod

SPECS = registry.all_specs()


def test_trained_codebooks_reproduce(spark):
    """The pinned index literals ARE the trainer's output: re-train at
    TRAIN_SF and assert bit-equality.  This is the trainer→index loop —
    the constant the serve path broadcasts can never drift from the
    k-means that claims to produce it."""
    from kafka_stream_processing_spark.tools.train_codebooks import train_all

    trained = train_all(spark, cbmod.TRAIN_SF)
    assert trained["IVF_CENTROIDS"] == cbmod.IVF_CENTROIDS
    assert trained["PQ_CODEBOOKS"] == cbmod.PQ_CODEBOOKS
    assert trained["OPQ_DIM_ALLOC"] == cbmod.OPQ_DIM_ALLOC
    assert trained["OPQ_CODEBOOKS"] == cbmod.OPQ_CODEBOOKS
    assert trained["RPQ_CODEBOOKS"] == cbmod.RPQ_CODEBOOKS


def _exact_l2_top5(sf_dir: str) -> dict[int, list[int]]:
    """Exact squared-L2 top-5 per query vector (ties to lowest id) —
    numpy ground truth, independent of every Spark/SQL code path under
    test."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype=np.float64)
    gt: dict[int, list[int]] = {}
    for q in range(5):
        d2 = ((x - x[q]) ** 2).sum(axis=1)
        order = sorted(range(len(ids)), key=lambda i: (d2[i], ids[i]))
        gt[q] = [int(ids[i]) for i in order if ids[i] != q][:5]
    return gt


def test_pq_family_recall_exact_l2(spark, sf_small):
    """recall@5 floors for the quantized ANN family against exact-L2
    ground truth (the metric PQ approximates; the brute-force query ranks
    by cosine, so it is the wrong referee here).  Measured with the
    trained codebooks at sf0.001: pq_adc 7/25, ivfpq 7/25, opq 4/25,
    residual 7/25 — honest numbers for 12-bit codes (4 sub-spaces × 8
    entries) over near-isotropic synthetic embeddings; real corpora have
    cluster structure these codes exploit.  Floors sit well under the
    measured values: they catch structural regressions (wrong codebook
    join, LUT keyed off the wrong cell, empty probe), not tuning drift
    after a retrain."""
    gt = _exact_l2_top5("/root/testdata/sf0.001")
    floors = {
        "similarity_pq_adc_topk": 4,
        "similarity_ivfpq_topk": 4,
        "similarity_opq_rotated_pq_topk": 2,
        "similarity_residual_pq_topk": 4,
    }
    for name, floor in floors.items():
        approx: dict[int, set[int]] = {}
        for r in SPECS[name].fn(spark, sf_small).collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert approx.keys() == gt.keys(), name
        hits = sum(len(set(gt[q]) & approx[q]) for q in gt)
        assert hits >= floor, (name, hits)


def test_opq_alloc_balances_energy(spark):
    """The OPQ dimension allocation is a permutation of 0..63 giving
    each sub-space exactly SUBDIM dims, and the snake deal balances
    energy: every sub-space's total energy is within 2x of every
    other's (raw contiguous split has no such guarantee)."""
    alloc = cbmod.OPQ_DIM_ALLOC
    flat = sorted(d for dims in alloc for d in dims)
    assert flat == list(range(64))
    assert all(len(dims) == 16 for dims in alloc)
    con = duckdb.connect()
    e = con.execute(
        "SELECT i - 1 AS dim, SUM(CAST(x * x AS DECIMAL(18,12))) AS e "
        "FROM (SELECT unnest(embedding) AS x, "
        "unnest(generate_series(1, 64)) AS i "
        f"FROM '{cbmod.TRAIN_SF}/embeddings.parquet') GROUP BY 1"
    ).fetchall()
    energy = {int(d): float(v) for d, v in e}
    totals = [sum(energy[d] for d in dims) for dims in alloc]
    assert max(totals) <= 2.0 * min(totals), totals


def test_residual_pq_neighbors_live_in_probed_cells(spark, sf_small):
    """Every residual-PQ neighbor must sit in one of its query's probed
    IVF cells — the containment invariant that distinguishes the pruned
    search from an accidental full scan."""
    from kafka_stream_processing_spark.operators.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        _as_double_array,
        probe_cells,
    )
    from kafka_stream_processing_spark.sources.tables import table

    emb = table(spark, sf_small, "embeddings").select(
        "vec_id", _as_double_array("embedding").alias("emb")
    )
    probed = {
        r.vec_id: set(r.cells)
        for r in emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", probe_cells(F.col("emb"), IVF_NPROBE).alias("cells"))
        .collect()
    }
    rows = SPECS["similarity_residual_pq_topk"].fn(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.cell in probed[r.query_id], (r.query_id, r.cell)


def test_doremi_weights_invariants(spark, sf_small):
    """DoReMi output: weights form a distribution (Σ=1 up to the
    per-domain decimal quantum), every weight respects the uniform
    smoothing floor s/D, and the highest-proxy-loss domain ends
    upweighted relative to uniform — the direction the multiplicative
    update must push."""
    from kafka_stream_processing_spark.operators.pipeline import (
        DOREMI_SMOOTH,
    )

    rows = SPECS["sample_doremi_domain_weights"].fn(spark, sf_small).collect()
    d = len(rows)
    assert d >= 2
    assert abs(sum(r.doremi_weight for r in rows) - 1.0) < d * 1e-11
    floor = DOREMI_SMOOTH / d
    for r in rows:
        assert r.doremi_weight >= floor - 1e-12
    top = max(rows, key=lambda r: r.proxy_loss)
    assert top.doremi_weight > 1.0 / d
    # epochs_at_budget is the weight-implied repeat factor
    for r in rows:
        assert r.epochs_at_budget > 0.0


def test_bloom_prefilter_no_false_negatives(spark, sf_small):
    """The defining Bloom property: a doc whose fingerprint IS in the
    corpus must always get bloom_maybe=true — (false, true) rows are a
    broken filter, at any geometry.  Also sanity: both verdict values
    occur at this saturation (all-true would mean the probe ignores the
    bitmap)."""
    rows = SPECS["corpus_bloom_prefilter"].fn(spark, sf_small).collect()
    assert rows
    assert not [r for r in rows if r.is_dup and not r.bloom_maybe]
    assert {r.bloom_maybe for r in rows} == {True, False} or all(
        not r.is_dup for r in rows
    )


def test_exact_substring_runs_vs_handbuilt_doc(spark, tmp_path):
    """Hand-built corpus: doc 0 and doc 1 share the 6-word run
    'a b c d e f' (=> 4 consecutive shared 3-grams, one span of
    max_run_tokens 6); doc 2 shares nothing.  Pins the island merge —
    a per-position formulation without the gaps-and-islands step would
    report 4 spans instead of 1."""
    import os

    from kafka_stream_processing_spark.operators.dedup import (
        dedup_exact_substring_runs,
    )

    docs = [
        (0, "a b c d e f x1 y1 z1"),
        (1, "p q a b c d e f r s"),
        (2, "m n o u v w k l t"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    tmp = str(tmp_path / "sf")
    os.makedirs(tmp)
    df.write.parquet(f"{tmp}/documents.parquet")
    rows = {
        r.doc_id: r for r in dedup_exact_substring_runs(spark, tmp).collect()
    }
    assert set(rows) == {0, 1}
    for d in (0, 1):
        assert rows[d].n_spans == 1, rows[d]
        assert rows[d].n_dup_grams == 4
        assert rows[d].max_run == 4
        assert rows[d].max_run_tokens == 6


def test_zorder_buckets_tile_the_plane(spark, sf_small):
    """Z-order pruning argument, asserted: the per-bucket 2-D bounding
    boxes must cover a small fraction of the key plane EACH — on
    average at most ~4 quadtree cells' worth (the max straddle of a
    contiguous Morton range), against the full-plane boxes a
    single-dimension layout yields for the second column.  Also pins
    the bucket id arithmetic: every bucket must be a 7-bit value."""
    from kafka_stream_processing_spark.operators.layout import (
        ZORDER_BUCKET_BITS,
    )

    rows = SPECS["layout_zorder_lineitem"].fn(spark, sf_small).collect()
    assert len(rows) > 8  # normalization must spread tiny key domains
    px = max(r.x_max for r in rows) + 1
    py = max(r.y_max for r in rows) + 1
    plane = px * py
    covers = [
        (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) / plane
        for r in rows
    ]
    assert all(0 <= r.bucket < (1 << ZORDER_BUCKET_BITS) for r in rows)
    assert sum(covers) / len(covers) < 0.5, covers


def _xy2d_ref(order_cells: int, x: int, y: int) -> int:
    """Independent pure-Python Hilbert xy2d (the classic C routine) —
    the triple-check against a shared Spark/oracle bug: both engine
    sides are generated from the operator module's walk, this one is
    written from the textbook algorithm."""
    d = 0
    s = order_cells // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_reference_is_a_space_filling_curve():
    """The Python reference itself must be a true Hilbert curve on the
    operator's 256x256 grid: a bijection onto 0..65535 whose
    consecutive positions are always GRID NEIGHBOURS (|dx|+|dy| = 1) —
    the locality property Morton codes lack (Z jumps across the
    plane)."""
    n = 256
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[_xy2d_ref(n, x, y)] = (x, y)
    assert len(pos) == n * n
    assert set(pos) == set(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, pos[d], pos[d + 1])


def test_hilbert_operator_matches_reference(spark):
    """The operator's unrolled Column chain must agree with the
    independent reference on a spread of cells."""
    from kafka_stream_processing_spark.operators.layout import (
        _CELLS,
        hilbert_index,
    )

    cells = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(cells, "cx int, cy int")
    got = {(r.cx, r.cy): r.hd for r in hilbert_index(df).collect()}
    for x, y in cells:
        assert got[(x, y)] == _xy2d_ref(_CELLS, x, y), (x, y)


def _morton_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_hilbert_clusters_less_than_morton_on_range_queries():
    """The reason to offer Hilbert next to Z-order, asserted on the
    metric where the advantage actually lives (Moon et al. 2001,
    "Analysis of the clustering properties of the Hilbert space-filling
    curve"): over a sample of rectangular query regions, the mean
    number of MAXIMAL CONTIGUOUS CURVE RUNS covering the region (= how
    many separate file ranges a reader must touch) is lower for Hilbert
    than for the Morton curve.  NB bounding boxes of top-bit BUCKETS
    are the one metric Morton wins by construction — its buckets are
    exactly axis-aligned quadtree rectangles — which is why the pin is
    on query clustering, not bucket boxes (measured: bucket bbox mean
    cover 0.0011 Hilbert vs 0.0005 Morton on lineitem)."""

    def runs(curve, x0, y0, w, h):
        idx = sorted(
            curve(x, y) for x in range(x0, x0 + w) for y in range(y0, y0 + h)
        )
        return 1 + sum(
            1 for a, b in zip(idx, idx[1:]) if b != a + 1
        )

    hilbert = lambda x, y: _xy2d_ref(256, x, y)  # noqa: E731
    rects = [
        (x0, y0, 20, 20) for x0 in range(3, 230, 31) for y0 in range(5, 230, 37)
    ]
    h_runs = sum(runs(hilbert, *r) for r in rects) / len(rects)
    z_runs = sum(runs(_morton_ref, *r) for r in rects) / len(rects)
    assert h_runs < z_runs, (h_runs, z_runs)


def test_two_stage_rerank_lifts_recall_over_ivfpq(spark, sf_small):
    """The rerank stage must measurably correct ADC quantization error:
    recall@5 vs exact-L2 ground truth for the two-stage operator
    (measured 16/25 at sf0.001) must beat plain IVF+PQ's (measured
    7/25) and clear an absolute floor of 10 — both well under measured
    so only structural regressions (rerank reading the wrong vectors,
    shortlist mis-keyed) trip them."""
    gt = _exact_l2_top5("/root/testdata/sf0.001")

    def recall(name):
        got: dict[int, set[int]] = {}
        for r in SPECS[name].fn(spark, sf_small).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(set(gt[q]) & got.get(q, set())) for q in gt)

    two = recall("similarity_rerank_two_stage")
    ivfpq = recall("similarity_ivfpq_topk")
    assert two >= 10, two
    assert two > ivfpq, (two, ivfpq)


def test_ccnet_buckets_are_balanced_terciles(spark, sf_small):
    """Per language, head/middle/tail must each hold n/3 (+-1) docs and
    head must have the lowest perplexity range — the CCNet contract."""
    rows = SPECS["quality_ccnet_perplexity_buckets"].fn(
        spark, sf_small
    ).collect()
    by_lang: dict[str, dict[str, list]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(
            r.ppl_centi
        )
    assert by_lang
    for lang, buckets in by_lang.items():
        sizes = {b: len(v) for b, v in buckets.items()}
        n = sum(sizes.values())
        assert set(sizes) == {"head", "middle", "tail"}, (lang, sizes)
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        assert max(buckets["head"]) <= min(buckets["middle"]), lang
        assert max(buckets["middle"]) <= min(buckets["tail"]), lang
