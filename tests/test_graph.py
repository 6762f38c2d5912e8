"""Invariants for the iterative graph operators (clustering components
already have oracle parity; these pin the algebraic properties)."""

from __future__ import annotations

from kafka_stream_processing_spark import registry

SPECS = registry.all_specs()


def test_pagerank_bounds_and_conservation(spark, sf_small):
    """Every rank is at least the teleport mass; total mass never
    exceeds 1 (our formulation drops dangling mass rather than
    redistributing it, so sum <= 1); the nation set is complete."""
    rows = SPECS["graph_pagerank_trade"].fn(spark, sf_small).collect()
    assert len(rows) == 25
    total = sum(r.pagerank for r in rows)
    assert all(r.pagerank >= 0.006 - 1e-12 for r in rows)
    assert total <= 1.0 + 1e-9
    # Guaranteed floor is the teleport mass alone (25 * 0.006): damped
    # inflow can decay arbitrarily through dangling-mass loss.
    assert total >= 0.15 - 1e-9


def test_components_labels_are_canonical_members(spark, sf_small):
    """Each cluster id is the minimum doc_id of its own cluster, and
    every member's cluster_size agrees."""
    rows = SPECS["dedup_cluster_components"].fn(spark, sf_small).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert ids[0] == cid, (cid, ids[:3])
        assert {m.cluster_size for m in members} == {len(members)}
