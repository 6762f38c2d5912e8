"""Data-layout operators: multi-dimensional clustering for scan pruning.

A 100 TB table is only as fast as the fraction of it a query can SKIP.
Partitioning prunes on one column; **Z-ordering** (Morton curves — the
technique behind Delta Lake's OPTIMIZE ZORDER BY and the space-filling
curves literature) interleaves the bits of several columns so that rows
close in the multi-dimensional key space land in the same files, and
min/max file statistics then prune multi-predicate scans on ANY of the
dimensions.

The reference has no storage layout at all (it reads one Kafka topic,
UniqueUsersCounter.java:63); this module is part of the training-data
extension: curating a corpus at scale ends with WRITING it, and the
write layout decides every downstream scan's cost.

Like production Z-order writers, the key columns are first NORMALIZED
to the code domain — Delta uses rank-based range-partition ids; here an
equal-width integer scaling over each column's observed max keeps the
mapping deterministic for the cross-engine oracle (rank-based ntile has
tie-nondeterminism at bucket frontiers).  The interleave itself is pure
integer Column arithmetic (a Python loop EMITS 16 constant-folded
shift/mask terms — whole-stage codegen, no UDF), and the same Python
constants generate the DuckDB oracle, so Spark and oracle share one
source of truth for the bit arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table

#: Bits per normalized dimension (Morton code is 2x this wide) and the
#: number of leading Morton bits that define a file bucket (2^7 = 128
#: buckets of ~equal Morton range).
ZORDER_DIM_BITS = 8
ZORDER_BUCKET_BITS = 7


def morton_interleave(x: Column, y: Column) -> Column:
    """Morton (Z-order) code: bit i of x -> bit 2i, bit i of y ->
    bit 2i+1.  Emitted as 2*ZORDER_DIM_BITS constant shift/mask terms —
    Catalyst folds them into one codegen expression."""
    z = F.lit(0).cast("bigint")
    for i in range(ZORDER_DIM_BITS):
        z = z + F.shiftleft(
            F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def _morton_sql(x: str, y: str) -> str:
    """The identical interleave for the DuckDB oracle, generated from
    the same constants."""
    terms = []
    for i in range(ZORDER_DIM_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_CELLS = 1 << ZORDER_DIM_BITS
_BUCKET_SHIFT = 2 * ZORDER_DIM_BITS - ZORDER_BUCKET_BITS


@register(
    "layout_zorder_lineitem",
    oracle=f"""
    WITH dom AS (
        SELECT max(l_partkey) AS mx, max(l_suppkey) AS my FROM lineitem
    ),
    coded AS (
        SELECT (l_partkey * {_CELLS}) // (dom.mx + 1) AS cx,
               (l_suppkey * {_CELLS}) // (dom.my + 1) AS cy
        FROM lineitem, dom
    ),
    z AS (
        SELECT cx, cy, {_morton_sql("cx", "cy")} AS zv FROM coded
    )
    SELECT CAST(zv >> {_BUCKET_SHIFT} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cx) AS BIGINT) AS x_min,
           CAST(max(cx) AS BIGINT) AS x_max,
           CAST(min(cy) AS BIGINT) AS y_min,
           CAST(max(cy) AS BIGINT) AS y_max
    FROM z
    GROUP BY 1
    """,
    tags=("layout", "zorder"),
)
def layout_zorder_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over lineitem's (l_partkey, l_suppkey):
    each key is scaled equal-width onto an 8-bit cell grid over its
    observed domain, the two cell ids interleave into a 16-bit Morton
    code, rows bucket by the code's top 7 bits (128 contiguous Morton
    ranges — the file boundaries a ZORDER write would produce), and
    each bucket reports the (min, max) cell ranges of BOTH dimensions —
    exactly the footer statistics that let a reader prune files for
    predicates on either key.  The audit IS the pruning argument:
    bucket bounding boxes tile the 2-D key plane (pinned: mean coverage
    well under half the plane) where a single-column sort yields
    full-width boxes for the second column.

    Scale: the domain scan is a 2-value aggregate (broadcast back via
    cross join of one row); the Morton code is 32 constant-folded
    shift/add terms inside whole-stage codegen (zero Python, zero
    shuffle to compute); bucketing by HIGH BITS is a static map — the
    real write would `repartitionByRange(z)` (one range shuffle, the
    cost any sorted write already pays) and this audit's only shuffle
    is the per-bucket aggregate with 128 groups.  Cites Delta Lake
    OPTIMIZE ZORDER semantics; implementation is original integer
    arithmetic."""
    li = table(spark, sf_dir, "lineitem")
    dom = li.agg(
        F.max("l_partkey").alias("mx"), F.max("l_suppkey").alias("my")
    )
    coded = li.crossJoin(F.broadcast(dom)).select(
        F.expr(f"(l_partkey * {_CELLS}) div (mx + 1)").alias("cx"),
        F.expr(f"(l_suppkey * {_CELLS}) div (my + 1)").alias("cy"),
    )
    z = coded.select(
        "cx", "cy", morton_interleave(F.col("cx"), F.col("cy")).alias("zv")
    )
    return (
        z.select(
            F.shiftright("zv", _BUCKET_SHIFT).cast("bigint").alias("bucket"),
            "cx",
            "cy",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cx").cast("bigint").alias("x_min"),
            F.max("cx").cast("bigint").alias("x_max"),
            F.min("cy").cast("bigint").alias("y_min"),
            F.max("cy").cast("bigint").alias("y_max"),
        )
    )


#: 3-D variant: fewer bits per dimension (the code is 3x as wide), same
#: 128-bucket file granularity.
ZORDER3_DIM_BITS = 6
_CELLS3 = 1 << ZORDER3_DIM_BITS
_BUCKET3_SHIFT = 3 * ZORDER3_DIM_BITS - ZORDER_BUCKET_BITS


def morton3_interleave(x: Column, y: Column, z: Column) -> Column:
    """3-D Morton code: bit i of x -> 3i, of y -> 3i+1, of z -> 3i+2."""
    m = F.lit(0).cast("bigint")
    for i in range(ZORDER3_DIM_BITS):
        for j, c in enumerate((x, y, z)):
            m = m + F.shiftleft(
                F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
                3 * i + j,
            )
    return m


def _morton3_sql(x: str, y: str, z: str) -> str:
    terms = []
    for i in range(ZORDER3_DIM_BITS):
        for j, c in enumerate((x, y, z)):
            terms.append(f"((({c} >> {i}) & 1) << {3 * i + j})")
    return " + ".join(terms)


@register(
    "layout_zorder3_lineitem",
    oracle=f"""
    WITH dom AS (
        SELECT max(l_partkey) AS mx, max(l_suppkey) AS my,
               max(l_orderkey) AS mz
        FROM lineitem
    ),
    coded AS (
        SELECT (l_partkey * {_CELLS3}) // (dom.mx + 1) AS cx,
               (l_suppkey * {_CELLS3}) // (dom.my + 1) AS cy,
               (l_orderkey * {_CELLS3}) // (dom.mz + 1) AS cz
        FROM lineitem, dom
    ),
    m AS (
        SELECT cx, cy, cz, {_morton3_sql("cx", "cy", "cz")} AS mv FROM coded
    )
    SELECT CAST(mv >> {_BUCKET3_SHIFT} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cx) AS BIGINT) AS x_min, CAST(max(cx) AS BIGINT) AS x_max,
           CAST(min(cy) AS BIGINT) AS y_min, CAST(max(cy) AS BIGINT) AS y_max,
           CAST(min(cz) AS BIGINT) AS z_min, CAST(max(cz) AS BIGINT) AS z_max
    FROM m
    GROUP BY 1
    """,
    tags=("layout", "zorder"),
)
def layout_zorder3_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-column Z-order layout audit over lineitem's (l_partkey,
    l_suppkey, l_orderkey): equal-width 6-bit cells per dimension, an
    18-bit 3-D Morton interleave, buckets from the code's top 7 bits,
    and per-bucket (min, max) footer statistics for all THREE
    dimensions.  Multi-column layout is where curve clustering earns its
    keep: a single-column sort gives full-width boxes on the other two
    columns, while the 3-D curve gives every bucket a bounded box in all
    three — predicates on ANY of the columns prune files.

    Scale: identical plan shape to the 2-D audit — a 3-value domain
    aggregate broadcast back, 54 constant-folded shift/add terms in
    whole-stage codegen, one 128-group aggregate; a real write adds only
    the repartitionByRange(mv) any sorted write pays."""
    li = table(spark, sf_dir, "lineitem")
    dom = li.agg(
        F.max("l_partkey").alias("mx"),
        F.max("l_suppkey").alias("my"),
        F.max("l_orderkey").alias("mz"),
    )
    coded = li.crossJoin(F.broadcast(dom)).select(
        F.expr(f"(l_partkey * {_CELLS3}) div (mx + 1)").alias("cx"),
        F.expr(f"(l_suppkey * {_CELLS3}) div (my + 1)").alias("cy"),
        F.expr(f"(l_orderkey * {_CELLS3}) div (mz + 1)").alias("cz"),
    )
    m = coded.select(
        "cx",
        "cy",
        "cz",
        morton3_interleave(F.col("cx"), F.col("cy"), F.col("cz")).alias("mv"),
    )
    return (
        m.select(
            F.shiftright("mv", _BUCKET3_SHIFT).cast("bigint").alias("bucket"),
            "cx",
            "cy",
            "cz",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cx").cast("bigint").alias("x_min"),
            F.max("cx").cast("bigint").alias("x_max"),
            F.min("cy").cast("bigint").alias("y_min"),
            F.max("cy").cast("bigint").alias("y_max"),
            F.min("cz").cast("bigint").alias("z_min"),
            F.max("cz").cast("bigint").alias("z_max"),
        )
    )


#: Hilbert iteration schedule: one rotate/flip step per bit level, high
#: bit first.  Shared by the Spark chain and the generated oracle SQL.
_HILBERT_STEPS = [1 << k for k in range(ZORDER_DIM_BITS - 1, -1, -1)]


def _hilbert_sql() -> str:
    """Chained CTEs h0..h{n-1}, each one unrolled iteration of the
    classic xy2d walk (Wikipedia 'Hilbert curve' C routine): quadrant
    digit (3*rx XOR ry) accumulates into hd, then the frame rotates —
    (x,y)->(y,x) for the lower quadrants, flipped for rx=1."""
    ctes = []
    prev = "seed"
    for k, s in enumerate(_HILBERT_STEPS):
        ctes.append(
            f"""h{k} AS (
        SELECT cx, cy,
               CASE WHEN ry = 1 THEN hx
                    WHEN rx = 0 THEN hy
                    ELSE {s} - 1 - hy END AS hx,
               CASE WHEN ry = 1 THEN hy
                    WHEN rx = 0 THEN hx
                    ELSE {s} - 1 - hx END AS hy,
               hd + {s * s} * xor(3 * rx, ry) AS hd
        FROM (SELECT *,
                     CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                     CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
              FROM {prev})
    )"""
        )
        prev = f"h{k}"
    return ",\n    ".join(ctes)


def hilbert_index(df: DataFrame) -> DataFrame:
    """Append column hd = Hilbert index of (cx, cy), by the same
    unrolled iteration schedule as the oracle SQL."""
    cur = df.select(
        "cx",
        "cy",
        F.col("cx").alias("hx"),
        F.col("cy").alias("hy"),
        F.lit(0).cast("bigint").alias("hd"),
    )
    for s in _HILBERT_STEPS:
        rx = F.when(F.col("hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        cur = cur.select(
            "cx",
            "cy",
            "hx",
            "hy",
            rx.alias("rx"),
            ry.alias("ry"),
            "hd",
        ).select(
            "cx",
            "cy",
            F.when(F.col("ry") == 1, F.col("hx"))
            .when(F.col("rx") == 0, F.col("hy"))
            .otherwise(F.lit(s - 1) - F.col("hy"))
            .alias("hx"),
            F.when(F.col("ry") == 1, F.col("hy"))
            .when(F.col("rx") == 0, F.col("hx"))
            .otherwise(F.lit(s - 1) - F.col("hx"))
            .alias("hy"),
            (
                F.col("hd")
                + F.lit(s * s) * (F.lit(3) * F.col("rx")).bitwiseXOR(F.col("ry"))
            ).alias("hd"),
        )
    return cur.select("cx", "cy", "hd")


@register(
    "layout_hilbert_lineitem",
    oracle=f"""
    WITH dom AS (
        SELECT max(l_partkey) AS mx, max(l_suppkey) AS my FROM lineitem
    ),
    seed AS (
        SELECT (l_partkey * {_CELLS}) // (dom.mx + 1) AS cx,
               (l_suppkey * {_CELLS}) // (dom.my + 1) AS cy,
               (l_partkey * {_CELLS}) // (dom.mx + 1) AS hx,
               (l_suppkey * {_CELLS}) // (dom.my + 1) AS hy,
               0 AS hd
        FROM lineitem, dom
    ),
    {_hilbert_sql()}
    SELECT CAST(hd >> {_BUCKET_SHIFT} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cx) AS BIGINT) AS x_min,
           CAST(max(cx) AS BIGINT) AS x_max,
           CAST(min(cy) AS BIGINT) AS y_min,
           CAST(max(cy) AS BIGINT) AS y_max
    FROM h{len(_HILBERT_STEPS) - 1}
    GROUP BY 1
    """,
    tags=("layout", "hilbert"),
)
def layout_hilbert_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout audit — same normalization, bucketing and
    per-bucket min/max statistics as layout_zorder_lineitem, but the
    cell ordering is the Hilbert space-filling curve (the unrolled
    xy2d rotate/flip walk, 8 constant iterations in whole-stage
    codegen).  Consecutive Hilbert positions are always grid
    neighbours, so a rectangular query region is covered by FEWER
    contiguous curve ranges than under Morton (Moon et al. 2001) —
    fewer separate file ranges to read; that clustering advantage is
    the measured pin in tests.  Honest trade, also measured there:
    Morton's top-bit buckets are exactly axis-aligned quadtree
    rectangles, so per-BUCKET bounding boxes are tighter under Morton
    (0.0005 vs 0.0011 mean cover on this data) — pick the curve by
    whether readers issue range queries (Hilbert) or rely on per-file
    min/max pruning alone (Morton).

    Scale: identical plan shape to the Z-order audit — a 2-value domain
    aggregate broadcast back, a constant-unrolled integer expression
    chain (zero Python, zero shuffle), and one 128-group aggregate; a
    real write adds only the repartitionByRange(hd) any sorted write
    pays."""
    li = table(spark, sf_dir, "lineitem")
    dom = li.agg(
        F.max("l_partkey").alias("mx"), F.max("l_suppkey").alias("my")
    )
    coded = li.crossJoin(F.broadcast(dom)).select(
        F.expr(f"(l_partkey * {_CELLS}) div (mx + 1)").alias("cx"),
        F.expr(f"(l_suppkey * {_CELLS}) div (my + 1)").alias("cy"),
    )
    return (
        hilbert_index(coded)
        .select(
            F.shiftright("hd", _BUCKET_SHIFT).cast("bigint").alias("bucket"),
            "cx",
            "cy",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cx").cast("bigint").alias("x_min"),
            F.max("cx").cast("bigint").alias("x_max"),
            F.min("cy").cast("bigint").alias("y_min"),
            F.max("cy").cast("bigint").alias("y_max"),
        )
    )


#: Skilling-transform iteration schedule for the 3-D Hilbert curve
#: (J. Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
#: 2004): one inverse-undo step per bit level below the top, high bit
#: first.  Shared by the Spark chain, the generated oracle SQL, and the
#: pure-Python test reference.
_H3_STEPS = [1 << k for k in range(ZORDER3_DIM_BITS - 1, 0, -1)]


def hilbert3_index(df: DataFrame) -> DataFrame:
    """Append hd = 3-D Hilbert index of (cx, cy, cz) via the unrolled
    Skilling transform: per bit level, the inverse-undo exchange/invert
    pass over the three axes (X[0] accumulates the frame); then Gray
    encoding across axes; then the low-bit correction XOR; finally the
    transposed bits interleave into the index.  All integer CASE/XOR
    Column arithmetic — whole-stage codegen, zero Python, zero
    shuffle."""
    cur = df.select(
        "cx", "cy", "cz",
        F.col("cx").alias("hx"),
        F.col("cy").alias("hy"),
        F.col("cz").alias("hz"),
    )

    def _xor(a, b):
        return a.bitwiseXOR(b)

    for q in _H3_STEPS:
        p = q - 1
        # i = 0: the else-branch is the identity (X[0]^X[0] = 0).
        cur = cur.select(
            "cx", "cy", "cz",
            F.when(
                F.col("hx").bitwiseAND(F.lit(q)) > 0,
                _xor(F.col("hx"), F.lit(p)),
            ).otherwise(F.col("hx")).alias("hx"),
            "hy", "hz",
        )
        # i = 1 and i = 2: exchange low bits with X[0] or invert X[0].
        for axis in ("hy", "hz"):
            t = _xor(F.col("hx"), F.col(axis)).bitwiseAND(F.lit(p))
            cur = cur.select(
                "cx", "cy", "cz",
                F.when(
                    F.col(axis).bitwiseAND(F.lit(q)) > 0,
                    _xor(F.col("hx"), F.lit(p)),
                ).otherwise(_xor(F.col("hx"), t)).alias("hx"),
                *[
                    F.when(F.col(axis).bitwiseAND(F.lit(q)) > 0, F.col(c))
                    .otherwise(_xor(F.col(c), t))
                    .alias(c)
                    if c == axis
                    else F.col(c).alias(c)
                    for c in ("hy", "hz")
                ],
            )
    # Gray encode: X[i] ^= X[i-1], in axis order.
    cur = cur.select(
        "cx", "cy", "cz",
        "hx",
        _xor(F.col("hy"), F.col("hx")).alias("hy"),
        _xor(F.col("hz"), _xor(F.col("hy"), F.col("hx"))).alias("hz"),
    )
    # Correction: t = XOR of (Q-1) over set high bits of X[n-1].
    t = F.lit(0)
    for q in _H3_STEPS:
        t = _xor(
            t,
            F.when(
                F.col("hz").bitwiseAND(F.lit(q)) > 0, F.lit(q - 1)
            ).otherwise(F.lit(0)),
        )
    cur = cur.select(
        "cx", "cy", "cz",
        _xor(F.col("hx"), t).alias("hx"),
        _xor(F.col("hy"), t).alias("hy"),
        _xor(F.col("hz"), t).alias("hz"),
    )
    # Interleave the transposed bits: bit j of X[i] -> 3j + (2 - i).
    hd = F.lit(0).cast("bigint")
    for j in range(ZORDER3_DIM_BITS):
        for off, c in ((2, "hx"), (1, "hy"), (0, "hz")):
            hd = hd + F.shiftleft(
                F.shiftright(F.col(c).cast("bigint"), j).bitwiseAND(F.lit(1)),
                3 * j + off,
            )
    return cur.select("cx", "cy", "cz", hd.alias("hd"))


def _hilbert3_sql() -> str:
    """The identical Skilling chain as DuckDB CTEs, generated from the
    same schedule."""
    ctes = []
    prev = "seed3"
    k = 0

    def add(body: str) -> None:
        nonlocal prev, k
        ctes.append(f"g{k} AS (\n        {body}\n        FROM {prev})")
        prev = f"g{k}"
        k += 1

    for q in _H3_STEPS:
        p = q - 1
        add(
            "SELECT cx, cy, cz,\n"
            f"               CASE WHEN (hx & {q}) > 0 THEN xor(hx, {p})\n"
            "                    ELSE hx END AS hx,\n"
            "               hy, hz"
        )
        for axis, other in (("hy", "hz"), ("hz", "hy")):
            add(
                "SELECT cx, cy, cz,\n"
                f"               CASE WHEN ({axis} & {q}) > 0 THEN xor(hx, {p})\n"
                f"                    ELSE xor(hx, (xor(hx, {axis}) & {p})) END AS hx,\n"
                f"               CASE WHEN ({axis} & {q}) > 0 THEN {axis}\n"
                f"                    ELSE xor({axis}, (xor(hx, {axis}) & {p})) END AS {axis},\n"
                f"               {other}"
            )
    add(
        "SELECT cx, cy, cz, hx,\n"
        "               xor(hy, hx) AS hy,\n"
        "               xor(hz, xor(hy, hx)) AS hz"
    )
    t_expr = "0"
    for q in _H3_STEPS:
        t_expr = (
            f"xor({t_expr}, CASE WHEN (hz & {q}) > 0 THEN {q - 1} ELSE 0 END)"
        )
    add(f"SELECT cx, cy, cz, hx, hy, hz, {t_expr} AS t")
    add(
        "SELECT cx, cy, cz,\n"
        "               xor(hx, t) AS hx, xor(hy, t) AS hy, xor(hz, t) AS hz"
    )
    terms = []
    for j in range(ZORDER3_DIM_BITS):
        for off, c in ((2, "hx"), (1, "hy"), (0, "hz")):
            terms.append(f"((({c} >> {j}) & 1) << {3 * j + off})")
    add(f"SELECT cx, cy, cz, {' + '.join(terms)} AS hd")
    return ",\n    ".join(ctes), prev


_H3_CTES, _H3_LAST = _hilbert3_sql()


@register(
    "layout_hilbert3_lineitem",
    oracle=f"""
    WITH dom AS (
        SELECT max(l_partkey) AS mx, max(l_suppkey) AS my,
               max(l_orderkey) AS mz
        FROM lineitem
    ),
    seed3 AS (
        SELECT (l_partkey * {_CELLS3}) // (dom.mx + 1) AS cx,
               (l_suppkey * {_CELLS3}) // (dom.my + 1) AS cy,
               (l_orderkey * {_CELLS3}) // (dom.mz + 1) AS cz,
               (l_partkey * {_CELLS3}) // (dom.mx + 1) AS hx,
               (l_suppkey * {_CELLS3}) // (dom.my + 1) AS hy,
               (l_orderkey * {_CELLS3}) // (dom.mz + 1) AS hz
        FROM lineitem, dom
    ),
    {_H3_CTES}
    SELECT CAST(hd >> {_BUCKET3_SHIFT} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cx) AS BIGINT) AS x_min, CAST(max(cx) AS BIGINT) AS x_max,
           CAST(min(cy) AS BIGINT) AS y_min, CAST(max(cy) AS BIGINT) AS y_max,
           CAST(min(cz) AS BIGINT) AS z_min, CAST(max(cz) AS BIGINT) AS z_max
    FROM {_H3_LAST}
    GROUP BY 1
    """,
    tags=("layout", "hilbert"),
)
def layout_hilbert3_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D Hilbert-curve layout audit over lineitem's (l_partkey,
    l_suppkey, l_orderkey) — the same normalization, bucketing and
    per-bucket min/max statistics as layout_zorder3_lineitem, but cells
    order along a TRUE 3-D Hilbert curve via the unrolled Skilling
    transform (bijectivity and the every-step-is-a-grid-neighbour
    property are pinned against an independent pure-Python reference on
    the full 64^3 grid in tests).  Consecutive curve positions are
    always grid neighbours in 3-D too, so rectangular query boxes cover
    fewer contiguous curve ranges than under 3-D Morton — the same
    range-read trade the 2-D pair documents.

    Scale: identical plan shape to the other layout audits — a 3-value
    domain aggregate broadcast back, an unrolled integer CASE/XOR chain
    in whole-stage codegen (zero Python, zero shuffle), one 128-group
    aggregate."""
    li = table(spark, sf_dir, "lineitem")
    dom = li.agg(
        F.max("l_partkey").alias("mx"),
        F.max("l_suppkey").alias("my"),
        F.max("l_orderkey").alias("mz"),
    )
    coded = li.crossJoin(F.broadcast(dom)).select(
        F.expr(f"(l_partkey * {_CELLS3}) div (mx + 1)").alias("cx"),
        F.expr(f"(l_suppkey * {_CELLS3}) div (my + 1)").alias("cy"),
        F.expr(f"(l_orderkey * {_CELLS3}) div (mz + 1)").alias("cz"),
    )
    return (
        hilbert3_index(coded)
        .select(
            F.shiftright("hd", _BUCKET3_SHIFT).cast("bigint").alias("bucket"),
            "cx", "cy", "cz",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cx").cast("bigint").alias("x_min"),
            F.max("cx").cast("bigint").alias("x_max"),
            F.min("cy").cast("bigint").alias("y_min"),
            F.max("cy").cast("bigint").alias("y_max"),
            F.min("cz").cast("bigint").alias("z_min"),
            F.max("cz").cast("bigint").alias("z_max"),
        )
    )
