"""Round-trip tests for the CSV/JSON format-symmetric sources and sinks."""

from __future__ import annotations

from pyspark.sql import types as T

from csv_parquet_s3_spark.sinks.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("amount", T.DecimalType(10, 2), True),
        T.StructField("event_ts", T.TimestampType(), True),
    ]
)

ROWS = [
    (1, "alpha", "10.50", "2024-03-01 12:00:00.123456"),
    (2, None, "0.25", "2024-03-01 12:00:01.000000"),
    (3, "gamma", None, None),
]


def _source(spark):
    from decimal import Decimal
    from datetime import datetime

    data = [
        (
            i,
            n,
            Decimal(a) if a else None,
            datetime.strptime(ts, "%Y-%m-%d %H:%M:%S.%f") if ts else None,
        )
        for i, n, a, ts in ROWS
    ]
    return spark.createDataFrame(data, SCHEMA)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("id").collect()]


def test_csv_round_trip(spark, tmp_path):
    df = _source(spark)
    path = str(tmp_path / "csv_out")
    write_csv(df, path)
    back = read_csv(spark, path, SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(df)
    # null cells write as empty strings and read back as null (reference
    # empty→null semantics, CsvToParquetConverter.java:160-163)
    assert back.filter("name IS NULL").count() == 1


def test_jsonl_round_trip(spark, tmp_path):
    df = _source(spark)
    path = str(tmp_path / "json_out")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_orc_round_trip(spark, tmp_path):
    from csv_parquet_s3_spark.sinks.formats import read_orc, write_orc

    df = _source(spark)
    path = str(tmp_path / "orc_out")
    write_orc(df, path)
    back = read_orc(spark, path, SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(df)
    # self-describing: types survive without a declared schema
    assert dict(read_orc(spark, path).dtypes)["amount"] == "decimal(10,2)"
