"""Round-5e operator pins: degree-oriented triangle counting vs a
pure-Python reference, retention-cohort internal consistency, and
entity-resolution transitive closure vs an independent union-find."""

from __future__ import annotations

import duckdb

from kafka_stream_processing_spark import registry

SPECS = registry.all_specs()


# ---------------------------------------------------------- triangles

_EDGES_SQL = """
    SELECT DISTINCT LEAST(n1.n_name, n2.n_name) AS a,
                    GREATEST(n1.n_name, n2.n_name) AS b
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE n1.n_name <> n2.n_name
"""


def _edge_set(sf_dir: str) -> set[tuple[str, str]]:
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return set(con.execute(_EDGES_SQL).fetchall())


def test_triangles_match_python_reference(spark, sf_small):
    """Per-node triangle counts recomputed by brute-force adjacency-set
    intersection (independent of the degree-orientation algorithm under
    test) match the operator."""
    edges = _edge_set(sf_small)
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {
        n: sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and y in adj[x]
        )
        for n, nbrs in adj.items()
    }
    rows = SPECS["graph_triangle_count"].fn(spark, sf_small).collect()
    got = {r.node: (r.degree, r.triangles, r.clustering_coeff) for r in rows}
    assert set(got) == set(adj)
    for n, (deg, tri, cc) in got.items():
        assert deg == len(adj[n]), n
        assert tri == want[n], n
        if deg >= 2:
            assert abs(cc - 2 * tri / (deg * (deg - 1))) < 1e-12
    assert sum(t for _, t, _ in got.values()) % 3 == 0


# ------------------------------------------------------------ cohorts


def test_retention_cohort_consistency(spark, sf_small):
    """Day-0 cells ARE the cohort sizes (retention exactly 1.0), every
    (user, day) activity cell is counted exactly once, and offsets are
    never negative (a user cannot be active before their first day)."""
    rows = SPECS["window_retention_cohorts"].fn(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.day_offset >= 0
        if r.day_offset == 0:
            assert r.n_active == r.cohort_size
            assert r.retention == 1.0
        assert 0 < r.retention <= 1.0
    con = duckdb.connect()
    total_cells = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) "
        f"FROM '{sf_small}/events.parquet')"
    ).fetchone()[0]
    assert sum(r.n_active for r in rows) == total_cells


# -------------------------------------------------- entity resolution


def test_entity_resolution_matches_union_find(spark, sf_small):
    """Cluster assignment recomputed with an independent union-find over
    the raw DuckDB match pairs equals the operator's canonical keys for
    every part — transitive closure included."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{sf_small}/part.parquet'"
    )
    pairs = con.execute(
        """
        SELECT a.p_partkey, b.p_partkey
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 3
        """
    ).fetchall()
    keys = [r[0] for r in con.execute("SELECT p_partkey FROM part").fetchall()]
    parent = {k: k for k in keys}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {k: find(k) for k in keys}
    sizes: dict[int, int] = {}
    for c in want.values():
        sizes[c] = sizes.get(c, 0) + 1
    rows = SPECS["dedup_entity_resolution_parts"].fn(spark, sf_small).collect()
    got = {r.p_partkey: r for r in rows}
    assert set(got) == set(keys)
    for k in keys:
        assert got[k].canonical_key == want[k], k
        assert got[k].cluster_size == sizes[want[k]], k
        assert got[k].is_canonical == (k == want[k])
    n_canonical = sum(1 for r in rows if r.is_canonical)
    assert n_canonical == len(sizes)


# ------------------------------------------------- k-center coreset


def test_kcenter_matches_numpy_greedy(spark, sf_small):
    """Farthest-first trajectory recomputed in numpy float64 (the
    decimal quantization's 1e-12 perturbations cannot flip argmax gaps
    on this data) picks the identical center sequence, and radii are
    non-increasing."""
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_small}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    x = np.array([r[1] for r in rows], dtype=np.float64)
    chosen = [0]
    md = ((x - x[0]) ** 2).sum(axis=1)
    want_radii = []
    for _ in range(7):
        order = sorted(range(len(ids)), key=lambda i: (-md[i], ids[i]))
        nxt = order[0]
        want_radii.append(md[nxt])
        chosen.append(nxt)
        md = np.minimum(md, ((x - x[nxt]) ** 2).sum(axis=1))
    want_radii.append(md.max())
    got = sorted(
        SPECS["sample_kcenter_coreset"].fn(spark, sf_small).collect(),
        key=lambda r: r.k,
    )
    assert [r.center_id for r in got] == [ids[i] for i in chosen]
    radii = [r.radius2 for r in got]
    for a, b in zip(radii, radii[1:]):
        assert b <= a + 1e-9
    for r, w in zip(radii, want_radii):
        assert abs(r - w) < 1e-6


# -------------------------------------------- schema evolution merge


def test_schema_evolution_is_real(spark, sf_small):
    """The merged read must expose all five columns while a single v1
    generation alone has only three — proving mergeSchema actually
    unified two different on-disk schemas."""
    import os

    from kafka_stream_processing_spark.operators.connectors import _tmp_dir

    SPECS["connector_schema_evolution_merge"].fn(spark, sf_small).collect()
    path = _tmp_dir(sf_small, "schema_evolution")
    v1_cols = set(spark.read.parquet(os.path.join(path, "gen=1")).columns)
    merged_cols = set(
        spark.read.option("mergeSchema", True)
        .parquet(os.path.join(path, "gen=1"), os.path.join(path, "gen=2"))
        .columns
    )
    assert v1_cols == {"event_id", "user_id", "ts_us"}
    assert merged_cols == {"event_id", "user_id", "ts_us", "event_type", "value"}
    con = duckdb.connect()
    n_even = con.execute(
        f"SELECT count(*) FROM '{sf_small}/events.parquet' "
        "WHERE event_id % 2 = 0"
    ).fetchone()[0]
    row = SPECS["connector_schema_evolution_merge"].fn(spark, sf_small).collect()[0]
    assert row.type_backfilled == n_even
