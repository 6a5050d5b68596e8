"""Parquet table catalog for the driver's synthetic star schema.

A "table" is a directory-or-file of Parquet, mirroring the reference's
dataset-as-directory-of-files model (SURVEY.md §1.1, ``Main.java:34-37``).
Reads go through ``spark.read.parquet`` so Catalyst gets filter pushdown and
column pruning for free; at 100 TB each table is just a bigger directory with
the same code path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should broadcast in joins rather than shuffle.
# At TPC-H-like scale region/nation are constant-size and supplier/part/customer
# grow ~linearly but remain << lineitem; only the constant-size ones are safe
# to force-broadcast at 100 TB.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (sf_dir, name) → catalog table name. When a bucketed copy of a table has
# been materialized (sources/bucketed.py), load_table serves the catalog
# table instead of the raw parquet: its bucket metadata lets the planner
# prove co-partitioning and drop the per-query join/agg Exchange. Results
# are identical — only the physical layout differs — so every oracle check
# holds unchanged under the override.
_BUCKETED_OVERRIDES: dict[tuple[str, str], str] = {}


def set_bucketed_override(sf_dir: str, name: str, catalog_table: str) -> None:
    _BUCKETED_OVERRIDES[(os.path.normpath(sf_dir), name)] = catalog_table


def clear_bucketed_overrides() -> None:
    _BUCKETED_OVERRIDES.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    override = _BUCKETED_OVERRIDES.get((os.path.normpath(sf_dir), name))
    if override is not None:
        return spark.table(override)
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (no Spark type —
        # read raw int64 nanos via the legacy conf and divide to micros) and,
        # since the 2026-08 regeneration, as plain timestamp[us] with no
        # timezone (reads as TIMESTAMP_NTZ). Normalize both to TIMESTAMP
        # (LTZ): with the session timezone pinned to UTC the NTZ→LTZ cast is
        # wall-clock-identity and matches DuckDB's naive read exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` queries can run."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
