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
