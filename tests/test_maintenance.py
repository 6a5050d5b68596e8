"""Compaction: file-count reduction, data fidelity, atomic swap, sorted
rewrite with selective row-group stats."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from csv_parquet_s3_spark.maintenance import compact, parquet_file_count


def _fragmented_dataset(spark, path, n_files=24, rows=6000):
    (
        spark.range(rows)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            F.md5(F.col("id").cast("string").cast("binary")).alias("payload"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "ds")
    _fragmented_dataset(spark, path)
    before = spark.read.parquet(path)
    n_before = parquet_file_count(path)
    checksum_before = before.agg(F.sum(F.crc32(F.concat_ws("|", "id", "k", "payload")))).collect()[0][0]

    n_after = compact(spark, path, target_file_bytes=256 * 1024 * 1024)

    assert n_after < n_before
    after = spark.read.parquet(path)
    assert after.count() == 6000
    checksum_after = after.agg(F.sum(F.crc32(F.concat_ws("|", "id", "k", "payload")))).collect()[0][0]
    assert checksum_after == checksum_before
    # no staging/backup residue next to the dataset
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if "._" in d] == []


def test_compact_sorted_clusters_key_ranges(spark, tmp_path):
    path = str(tmp_path / "sorted_ds")
    _fragmented_dataset(spark, path)

    compact(spark, path, target_file_bytes=64 * 1024, sort_by=["id"])

    # every output file must cover a disjoint id range (range partitioning):
    # per-file min/max do not overlap → parquet stats prune point lookups
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    assert len(spans) > 1
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next


def test_upsert_updates_inserts_preserves(spark, tmp_path):
    from csv_parquet_s3_spark.maintenance import upsert

    path = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id bigint, tag string, v double"
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "B2", 99.0), (9, "new", 1.0)], "id bigint, tag string, v double"
    )
    n_updated, n_inserted = upsert(spark, path, updates, key="id")
    assert (n_updated, n_inserted) == (1, 1)

    got = {r.id: (r.tag, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a", 10.0),     # untouched
        2: ("B2", 99.0),    # updated
        3: ("c", 30.0),     # untouched
        9: ("new", 1.0),    # inserted
    }


def test_zorder_improves_two_column_skipping(spark, tmp_path):
    """After Z-order on (x, y), per-file min/max ranges must be selective on
    BOTH columns — a single-column sort can only localize its own column."""
    from csv_parquet_s3_spark.maintenance import compact_zorder

    path = str(tmp_path / "zds")
    (
        spark.range(20000)
        .selectExpr("id", "id % 141 AS x", "CAST(id / 141 AS BIGINT) AS y")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(path)
    )

    def avg_span(col):
        rows = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r.span for r in rows) / len(rows)

    x_before, y_before = avg_span("x"), avg_span("y")
    n = compact_zorder(spark, path, ["x", "y"], target_file_bytes=16 * 1024)
    assert n > 4  # multiple files → skipping is meaningful
    x_after, y_after = avg_span("x"), avg_span("y")
    # both dimensions localize (range-per-file shrinks materially)
    assert x_after < 0.7 * x_before
    assert y_after < 0.7 * y_before
    # data intact
    assert spark.read.parquet(path).count() == 20000
