"""Salted join equals plain join, including under heavy key skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.functions.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key
    large = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    plain = large.join(small, "k").select("k", "payload", "label")
    salted = salted_join(large, small, "k").select("k", "payload", "label")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    large = spark.range(0, 100).select((F.col("id") % 150).alias("k"), F.col("id").alias("p"))
    small = spark.range(0, 50).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = large.join(small, "k", "left")
    salted = salted_join(large, small, "k", how="left")
    assert salted.count() == plain.count()
    assert salted.filter(F.col("v").isNull()).count() == plain.filter(F.col("v").isNull()).count()
