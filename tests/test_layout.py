"""Z-order zonemap: the clustering must actually buy multi-column pruning —
per-bucket extents on the TRAILING dimension must be materially tighter than
a single-column sort's, and the morton key must be a true bit-interleave."""

from __future__ import annotations

import duckdb

from csv_parquet_s3_spark.operators.layout import (
    Z_BUCKETS,
    _morton_sql,
    layout_zorder_zonemap,
    morton_key,
)

SF = "/root/testdata/sf0.001"


def test_morton_key_is_bit_interleave(spark):
    rows = (
        spark.range(0, 300, 7)
        .selectExpr("id % 97 AS a", "id % 61 AS b")
        .select("a", "b", morton_key(["a", "b"]).alias("z"))
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        want = 0
        for bit in range(16):
            want |= ((r.a >> bit) & 1) << (2 * bit)
            want |= ((r.b >> bit) & 1) << (2 * bit + 1)
        assert r.z == want


def test_morton_sql_matches_column_expr(spark):
    # the oracle's integer-arithmetic interleave is the same function
    from pyspark.sql import functions as F

    df = spark.range(0, 200, 3).selectExpr("id % 83 AS a", "(id * 5) % 71 AS b")
    got = df.select(
        morton_key(["a", "b"]).alias("z1"),
        F.expr(_morton_sql(["a", "b"]).replace("//", "div")).alias("z2"),
    ).collect()
    assert all(r.z1 == r.z2 for r in got)


def test_zorder_extents_tighter_than_single_sort(spark):
    """Average per-bucket extent of the TRAILING column (l_suppkey) under
    Z-order must beat a plain ORDER BY l_partkey layout split into the same
    number of buckets — the reason multi-dim clustering exists."""
    zm = layout_zorder_zonemap(spark, SF).collect()
    assert sum(r.n_rows for r in zm) == duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'"
    ).fetchone()[0]
    z_avg = sum(r.supp_max - r.supp_min for r in zm) / len(zm)

    single = duckdb.sql(
        f"""
        SELECT bucket, MAX(l_suppkey) - MIN(l_suppkey) AS ext
        FROM (
            SELECT l_suppkey,
                   CAST((ROW_NUMBER() OVER (ORDER BY l_partkey, l_suppkey) - 1)
                        * {Z_BUCKETS}
                        / COUNT(*) OVER () AS BIGINT) AS bucket
            FROM '{SF}/lineitem.parquet'
        ) t GROUP BY bucket
        """
    ).df()
    s_avg = single["ext"].mean()
    assert z_avg < 0.8 * s_avg, f"z extent {z_avg} not tighter than sort {s_avg}"
