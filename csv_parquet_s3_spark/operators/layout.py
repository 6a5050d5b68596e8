"""Data-layout quality: the zonemap a Z-ordered file layout would carry.

Multi-dimensional clustering (Z-order / Hilbert, cf. `maintenance.compact_
zorder` / `compact_hilbert`) exists to make per-file min/max statistics
selective on EVERY clustered column — the mechanism behind Delta/Iceberg
`OPTIMIZE ZORDER BY` data skipping. This module registers the INSPECTABLE
half of that story as a hash-checked query: compute the Morton key for each
row, split the key space into the file-count's worth of buckets, and report
each bucket's min/max extent per dimension — exactly the zonemap the scan
planner would prune against.

The registered query interleaves the RAW 16-bit values (integer-only
arithmetic, bit-identical on any engine); the layout job itself
(`compact_zorder`) rank-buckets first, which is the right production choice
for skewed domains but replays only approximately in SQL (float
percent_rank). Raw vs ranked changes the key, not the zonemap mechanics.

At 100 TB: the key is a pure per-row expression (codegen, no shuffle); the
zonemap aggregation is one hash exchange on bucket — and it doubles as the
skew probe for choosing bucket boundaries before a re-layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

Z_BITS = 16  # bits kept per dimension (raw-value interleave)
Z_BUCKETS = 64  # target "file" count: key space divided into 64 equal ranges


def morton_key(cols: list[str], bits: int = Z_BITS) -> F.Column:
    """Morton (Z-order) interleave of the low ``bits`` of each column —
    pure JVM bit arithmetic (shiftleft/and/or), codegen-friendly, no UDF."""
    mask = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for bit in range(bits):
        for i, c in enumerate(cols):
            pos = bit * len(cols) + i
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(c).cast("bigint").bitwiseAND(F.lit(mask)), bit)
                    .bitwiseAND(F.lit(1)),
                    pos,
                )
            )
    return z


def _morton_sql(cols: list[str], bits: int = Z_BITS) -> str:
    """The identical interleave as engine-portable integer SQL: non-
    overlapping bits summed (no shift-operator dialect differences)."""
    mask = (1 << bits) - 1
    terms = []
    for bit in range(bits):
        for i, c in enumerate(cols):
            pos = bit * len(cols) + i
            terms.append(f"((({c} & {mask}) // {1 << bit}) % 2) * {1 << pos}")
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_zonemap",
    oracle=f"""
    WITH z AS (
        SELECT l_partkey, l_suppkey,
               {_morton_sql(['l_partkey', 'l_suppkey'])} AS zkey
        FROM lineitem
    ),
    top AS (SELECT MAX(zkey) AS maxz FROM z)
    SELECT bucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
           MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max
    FROM (
        SELECT l_partkey, l_suppkey,
               zkey * {Z_BUCKETS} // (maxz + 1) AS bucket
        FROM z CROSS JOIN top
    ) b
    GROUP BY bucket
    """,
)
def layout_zorder_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonemap of a Z-ordered lineitem layout on (l_partkey, l_suppkey):
    the key space splits into Z_BUCKETS equal ranges ("files") and each
    bucket reports the min/max extent of BOTH clustered columns — what the
    scan planner prunes against after an `OPTIMIZE ZORDER BY`. A filter on
    either column alone skips every bucket whose extent misses the
    predicate; the test suite pins that these extents are tighter than a
    single-column sort gives its trailing column. The bucket boundary is
    exact integer arithmetic (zkey·B ÷ (max+1)) off a one-row max — a
    broadcast, never a sort."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey",
        "l_suppkey",
        morton_key(["l_partkey", "l_suppkey"]).alias("zkey"),
    )
    top = z.agg(F.max("zkey").alias("maxz"))
    b = z.crossJoin(F.broadcast(top)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(f"zkey * {Z_BUCKETS} div (maxz + 1)").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("part_min"),
        F.max("l_partkey").alias("part_max"),
        F.min("l_suppkey").alias("supp_min"),
        F.max("l_suppkey").alias("supp_max"),
    )
