"""Stage a deterministic synthetic 10⁴-node graph for the scale probe.

VERDICT r13 item 4: the graph centrality family (k-truss, PPR, katz,
harmonic, HITS) rides the bounded 25-node nation trade graph in its
registered form, so stage_x10's fact-replica staging cannot grow it —
the scale story was docstring-only.  This tool materializes a graph
three orders of magnitude larger with the SAME columns the kernels
consume, so tools/probe_graph.py can drive the IDENTICAL iteration
schedules (`_ktruss_decompose`, `_ppr_power_iterate`) on it and
measure shuffle shapes and ×-factors instead of asserting them.

Construction (pure hash-deterministic — no RNG, reproducible across
runs and engines):

- ``N_NODES`` nodes ``g000000..g009999``, partitioned into
  ``N_NODES / COMMUNITY`` communities of ``COMMUNITY`` nodes each.
- intra-community undirected edges: pair (i, j), i < j, same
  community, kept when ``hash(i * N_NODES + j) % INTRA_MOD == 0``
  (~16 neighbors per node → expected triangle support ≈ 2.7 per
  intra edge, so a nonempty 4-truss SURVIVES the peel while sparse
  edges drop — both peel branches get exercised).
- cross-community edges: for each node i, one edge to
  ``hash(i * 2654435761) % N_NODES`` when that lands outside i's
  community (~1 bridge per node — bridges have no triangle support,
  so the peel removes them: the negative class).
- integer weight ``1 + hash(i + j) % 9`` for the directed/frac view.

Output parquet (``dst/graph_edges.parquet``): columns
``a, b`` (undirected, a < b, node-name strings) and ``w`` (weight).
Node table (``dst/graph_nodes.parquet``): column ``node``.

Usage:  python -m kafka_stream_processing_spark.tools.stage_graph \
            [n_nodes] [dst_dir]
Defaults: 10000 → /tmp/kssp_graph
"""

from __future__ import annotations

import os
import sys

import duckdb

N_NODES = 10_000
COMMUNITY = 100
INTRA_MOD = 6
ROW_GROUP = 65536


def stage(n_nodes: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT printf('g%06d', i) AS node
            FROM range({n_nodes}) t(i)
        ) TO '{dst}/graph_nodes.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})
        """
    )
    con.execute(
        f"""
        COPY (
            WITH intra AS (
                SELECT i.i AS u, j.j AS v
                FROM range({n_nodes}) i(i)
                JOIN range({n_nodes}) j(j)
                  ON j.j > i.i
                 AND j.j // {COMMUNITY} = i.i // {COMMUNITY}
                 AND hash(i.i * {n_nodes} + j.j) % {INTRA_MOD} = 0
            ),
            cross_e AS (
                SELECT i AS u,
                       CAST(hash(i * 2654435761) % {n_nodes} AS BIGINT)
                           AS v
                FROM range({n_nodes}) t(i)
                WHERE hash(i * 2654435761) % {n_nodes} // {COMMUNITY}
                      <> i // {COMMUNITY}
            ),
            all_e AS (
                SELECT least(u, v) AS u, greatest(u, v) AS v
                FROM (SELECT u, v FROM intra
                      UNION ALL
                      SELECT u, v FROM cross_e)
                WHERE u <> v
            )
            SELECT DISTINCT
                   printf('g%06d', u) AS a,
                   printf('g%06d', v) AS b,
                   1 + hash(u + v) % 9 AS w
            FROM all_e
        ) TO '{dst}/graph_edges.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP})
        """
    )
    n_e = con.execute(
        f"SELECT count(*) FROM '{dst}/graph_edges.parquet'"
    ).fetchone()[0]
    n_tri = con.execute(
        f"""
        WITH e AS (SELECT a, b FROM '{dst}/graph_edges.parquet')
        SELECT count(*)
        FROM e e1 JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        """
    ).fetchone()[0]
    print(f"staged {n_nodes} nodes, {n_e} edges, {n_tri} triangles -> {dst}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_NODES
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kssp_graph"
    stage(n, dst)
