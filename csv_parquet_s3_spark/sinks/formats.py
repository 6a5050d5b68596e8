"""Format-symmetric sources and sinks: CSV and JSON-lines read/write.

The reference reads CSV and writes Parquet only (SURVEY.md §2.2 "Scans" /
"Sinks"); a usable engine needs the reverse directions too. These are thin
declarative wrappers — the point is pinning the parity options (header
handling, empty→null, UTC timestamps) in one place so every entry/exit of
the engine agrees with the ingest semantics in :mod:`csv_parquet_s3_spark.
ingest` (reference behaviors at `CsvToParquetConverter.java:148-214`).

Scale: all four paths are plain distributed reader/writer plans — no driver
materialization, partition-parallel, committer-atomic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Reference CSV dialect: header row present but schema-declared (header is
#: consumed, binding is positional — CsvToParquetConverter.java:151), empty
#: cell → null (:160-163).
CSV_READ_OPTIONS = {
    "header": "true",
    "enforceSchema": "true",
    "nullValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
}

CSV_WRITE_OPTIONS = {
    "header": "true",
    "nullValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-declared CSV scan (never inferred — SchemaLoader.java:19-28)."""
    reader = spark.read.schema(schema)
    for k, v in CSV_READ_OPTIONS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink, dialect-symmetric with :func:`read_csv`."""
    writer = df.write.mode(mode)
    for k, v in CSV_WRITE_OPTIONS.items():
        writer = writer.option(k, v)
    writer.csv(path)


#: JSON's default timestamp pattern is millisecond-precision; micros would be
#: silently truncated on write, so both directions pin the full precision.
_JSON_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with a declared schema (inference off, same policy as
    CSV: the schema is the contract, the file is just bytes)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _JSON_TS_FORMAT)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — splittable, stream-appendable)."""
    df.write.mode(mode).option("timestampFormat", _JSON_TS_FORMAT).json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan. ORC is self-describing (schema travels with the file, like
    parquet), so the schema argument is an optional CONTRACT check rather
    than a binding: when given, the read projects to exactly those columns,
    surfacing drift as an analysis error instead of silent nulls."""
    df = spark.read.orc(path)
    if schema is not None:
        df = df.select(*[f.name for f in schema.fields])
    return df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (snappy, same policy as the parquet sink): the columnar
    interchange format for Hive-side consumers; predicate pushdown and
    column pruning work the same as parquet under Spark's reader."""
    df.write.mode(mode).option("compression", "snappy").orc(path)
