"""Bucketed table layout: co-located joins and aggregations without shuffle.

At 100 TB the dominant cost of orders ⋈ lineitem is the shuffle of both
facts on the join key. Hash-bucketing both tables on that key at WRITE time
(same bucket count) lets Spark's planner prove co-partitioning and run the
sort-merge join with **zero Exchange** — the shuffle is paid once at layout
time and amortized over every subsequent join/aggregate on the key.

The reference has no comparable concept (its output layout is file-per-input,
`CsvToParquetConverter.java:111-112`); this is the Spark-native answer to the
same "layout determines downstream cost" concern its 128 MiB row groups
address (`Main.java:44`).

Bucketed tables live in the session catalog (``saveAsTable`` — bucket
metadata is catalog state; plain ``.parquet(path)`` cannot carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``keys``. Joins/aggs between tables bucketed on the same keys with the
    same ``n_buckets`` need no Exchange; pre-sorting also removes the Sort.
    ``path`` makes it an external table (data outside the warehouse dir)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucket_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_table: str,
    right_table: str,
    keys_left: list[str],
    keys_right: list[str],
    n_buckets: int,
    base_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Bucket both sides of a recurring equi-join on their join keys and
    return the catalog-backed DataFrames (the shuffle-free join inputs)."""
    lp = f"{base_path}/{left_table}" if base_path else None
    rp = f"{base_path}/{right_table}" if base_path else None
    write_bucketed(left, left_table, keys_left, n_buckets, path=lp)
    write_bucketed(right, right_table, keys_right, n_buckets, path=rp)
    return spark.table(left_table), spark.table(right_table)
