"""Offline index trainer — closes the trainer→index loop.

The ANN operators in ``operators/similarity.py`` serve against MODEL
CONSTANTS (IVF coarse centroids, PQ codebooks, the OPQ dimension
allocation): the train/serve split every production vector index makes.
This module is the TRAIN side.  It runs the same Lloyd iteration as the
oracle-checked ``cluster_kmeans_embeddings`` query (same
``assign_nearest`` / ``dist2_exact`` kernels, same deterministic
lowest-vec_id seeding, same exact-decimal centroid update) over the
embedding table, plus its per-sub-space (PQ), permuted (OPQ), and
residual (RVQ) variants, and emits ``operators/_codebooks.py`` — pinned
literals with provenance, consumed by the serve-side operators and their
DuckDB oracles alike.

Reproducibility: everything is deterministic (seeds are the K lowest
vec_ids; distances and sums are decimal-quantized; export rounds to 6
decimals so both engines parse identical literals).  The loop is closed
by ``tests/test_properties.py::test_trained_codebooks_reproduce``, which
re-runs this trainer at TRAIN_SF and asserts the pinned module matches.

Usage::

    python -m kafka_stream_processing_spark.tools.train_codebooks

Scale: training touches the embedding column once per Lloyd iteration as
a map-side nested loop against K broadcast centroids (no vector
shuffle); the centroid update shuffles only (cluster, dim, component)
triples — K×DIM groups regardless of corpus size.  The collect at the
end is the K×DIM index artifact itself (the thing a real trainer writes
to the index file), not a data-plane collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,12)"

#: The corpus the pinned codebooks were trained on.  sf0.001 carries the
#: full 500-vector embedding table (embeddings don't scale down with sf),
#: so the trained index matches the sf0.01/sf0.1 serve-time distribution.
TRAIN_SF = "/root/testdata/sf0.001"
ROUND_TO = 6


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_stream_processing_spark.operators.similarity import (
        _as_double_array,
    )
    from kafka_stream_processing_spark.sources.tables import table

    return table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double_array("embedding").alias("emb")
    )


def _lloyd_update(members: DataFrame, key: list[str]) -> DataFrame:
    """One exact-decimal centroid update: mean per (key..., dim) of the
    member vectors' components — the same update as
    cluster_kmeans_embeddings, keyed generically so the sub-space (PQ)
    trainer can reuse it with key=(m, j)."""
    upd = (
        members.select(*key, F.posexplode("emb").alias("pos", "val"))
        .groupBy(*key, "pos")
        .agg(
            (
                F.sum(F.col("val").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("comp")
        )
    )
    return upd.groupBy(*key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "comp"))),
            lambda s: s["comp"],
        ).alias("cvec")
    )


def train_ivf_centroids(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 2
) -> list[list[float]]:
    """K-means over the full embedding table: seeds = the k lowest
    vec_ids (cluster_kmeans_embeddings' init), ``iters`` Lloyd rounds.
    With iters=2 the intermediate state is exactly the oracle-checked
    query's c1 centroids — the trainer IS that query, generalized."""
    from kafka_stream_processing_spark.operators.clustering import (
        assign_nearest,
    )

    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster_id"), F.col("emb").alias("cvec")
    )
    for _ in range(iters):
        members = assign_nearest(emb, cents).select(
            "vec_id", "cluster_id", "emb"
        )
        new = _lloyd_update(members, ["cluster_id"])
        # An emptied cluster keeps its previous centroid (FAISS policy),
        # so k never silently shrinks.
        cents = (
            cents.select("cluster_id", F.col("cvec").alias("old"))
            .join(new, "cluster_id", "left")
            .select(
                "cluster_id", F.coalesce("cvec", "old").alias("cvec")
            )
        )
    rows = cents.orderBy("cluster_id").collect()
    return [[round(float(x), ROUND_TO) for x in r["cvec"]] for r in rows]


def _sub_vectors(df: DataFrame) -> DataFrame:
    """(vec_id, m, s): PQ sub-vector split of an (vec_id, emb) frame."""
    from kafka_stream_processing_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
    )

    return df.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("emb"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
                    for m in range(PQ_M)
                ]
            )
        ).alias("m", "s"),
    )


def train_pq_codebooks(
    sub: DataFrame, k: int = 8, iters: int = 2
) -> list[list[list[float]]]:
    """Per-sub-space k-means, all sub-spaces in ONE dataflow: clusters
    are keyed (m, j), seeded from the k lowest vec_ids' sub-vectors,
    assignment joins on m only (each sub-vector scores its own
    sub-space's k entries).  Returns codebooks[m][j] = 16-d centroid."""
    from kafka_stream_processing_spark.operators.similarity import (
        PQ_M,
        dist2_exact,
    )

    cb = sub.filter(F.col("vec_id") < k).select(
        F.col("m").alias("cm"), F.col("vec_id").alias("j"), F.col("s").alias("c")
    )
    for _ in range(iters):
        w = Window.partitionBy("vec_id", "m").orderBy("dist2", "j")
        asn = (
            sub.join(F.broadcast(cb), F.col("m") == F.col("cm"))
            .select(
                "vec_id",
                "m",
                "j",
                dist2_exact(F.col("s"), F.col("c")).alias("dist2"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        members = asn.join(sub, ["vec_id", "m"]).select(
            "m", "j", F.col("s").alias("emb")
        )
        new = _lloyd_update(members, ["m", "j"]).select(
            F.col("m").alias("nm"), F.col("j").alias("nj"), "cvec"
        )
        cb = (
            cb.select("cm", "j", F.col("c").alias("old"))
            .join(
                new,
                (F.col("cm") == F.col("nm")) & (F.col("j") == F.col("nj")),
                "left",
            )
            .select("cm", "j", F.coalesce("cvec", "old").alias("c"))
        )
    rows = cb.orderBy("cm", "j").collect()
    out: list[list[list[float]]] = [[] for _ in range(PQ_M)]
    for r in rows:
        out[r["cm"]].append([round(float(x), ROUND_TO) for x in r["c"]])
    return out


def opq_dim_allocation(spark: SparkSession, sf_dir: str) -> list[list[int]]:
    """OPQ-style dimension allocation (Ge et al. 2014's balanced
    variance-allocation initialization, permutation-restricted): rank the
    64 dims by total energy (exact decimal Σx², ties to lowest dim) and
    deal them to the PQ_M sub-spaces in snake order, so every sub-space
    receives one dim from each energy quartile-of-four.  A permutation is
    an orthogonal rotation that is exactly representable — both engines
    apply it bit-identically, which a dense learned R could not
    guarantee.  Returns alloc[m] = the 16 source dims of sub-space m (in
    slot order)."""
    from kafka_stream_processing_spark.operators.similarity import PQ_M

    emb = _emb(spark, sf_dir)
    energy = (
        emb.select(F.posexplode("emb").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("e"))
        .orderBy(F.col("e").desc(), F.col("dim"))
        .collect()
    )
    alloc: list[list[int]] = [[] for _ in range(PQ_M)]
    for r, row in enumerate(energy):
        block, pos = divmod(r, PQ_M)
        m = pos if block % 2 == 0 else PQ_M - 1 - pos
        alloc[m].append(int(row["dim"]))
    return alloc


def permute(df: DataFrame, alloc: list[list[int]]) -> DataFrame:
    """(vec_id, emb) → (vec_id, emb) with dims gathered in allocation
    order — sub-space m's dims land contiguously, so the plain PQ
    sub-vector split afterwards realizes the OPQ allocation.  A gather by
    literal index positions: narrow, exactly representable, no shuffle."""
    order = [d for dims in alloc for d in dims]
    return df.select(
        "vec_id",
        F.array(*[F.col("emb")[i] for i in order]).alias("emb"),
    )


def residuals(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, emb) → (vec_id, cell, emb=residual x − c_cell) against
    the trained coarse centroids — the encoding-space transform of
    residual (IVF-residual / RVQ) product quantization."""
    from kafka_stream_processing_spark.operators.clustering import (
        assign_nearest,
    )

    cents = None
    sess = df.sparkSession
    cents = sess.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cluster_id int, cvec array<double>",
    )
    assigned = assign_nearest(df, cents).select("vec_id", "cluster_id", "emb")
    cvec = F.element_at(
        F.lit([[float(x) for x in c] for c in centroids]),
        F.col("cluster_id") + 1,
    )
    return assigned.select(
        "vec_id",
        F.col("cluster_id").alias("cell"),
        F.zip_with(F.col("emb"), cvec, lambda x, c: x - c).alias("emb"),
    )


def train_all(spark: SparkSession, sf_dir: str = TRAIN_SF) -> dict:
    emb = _emb(spark, sf_dir)
    ivf = train_ivf_centroids(spark, sf_dir)
    pq = train_pq_codebooks(_sub_vectors(emb))
    alloc = opq_dim_allocation(spark, sf_dir)
    opq = train_pq_codebooks(_sub_vectors(permute(emb, alloc)))
    res = residuals(emb, ivf).select("vec_id", "emb")
    rpq = train_pq_codebooks(_sub_vectors(res))
    return {
        "IVF_CENTROIDS": ivf,
        "PQ_CODEBOOKS": pq,
        "OPQ_DIM_ALLOC": alloc,
        "OPQ_CODEBOOKS": opq,
        "RPQ_CODEBOOKS": rpq,
    }


def render(trained: dict, sf_dir: str) -> str:
    lines = [
        '"""Trained ANN index constants — GENERATED, do not hand-edit.',
        "",
        "Produced by ``python -m kafka_stream_processing_spark.tools.",
        f'train_codebooks`` over ``{sf_dir}`` (deterministic: lowest-vec_id',
        "seeds, exact decimal Lloyd iterations, 6-decimal export).  The",
        "reproduction test (tests/test_properties.py::",
        "test_trained_codebooks_reproduce) re-trains and asserts equality,",
        "so these literals can never drift from the trainer that claims to",
        'produce them."""',
        "",
        f"TRAIN_SF = {sf_dir!r}",
        "",
    ]
    for name in (
        "IVF_CENTROIDS",
        "PQ_CODEBOOKS",
        "OPQ_DIM_ALLOC",
        "OPQ_CODEBOOKS",
        "RPQ_CODEBOOKS",
    ):
        lines.append(f"{name} = {trained[name]!r}")
        lines.append("")
    return "\n".join(lines)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("train-codebooks")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    trained = train_all(spark, TRAIN_SF)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "operators",
        "_codebooks.py",
    )
    with open(out, "w") as fh:
        fh.write(render(trained, TRAIN_SF))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
