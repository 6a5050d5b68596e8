"""Custom stateful streaming operator: state accumulates across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.streaming.stateful import user_lifetime_totals


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id bigint, value double").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    # state ops create one state-store partition per shuffle partition per
    # micro-batch; keep the test's state plumbing small
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        _run_stateful_scenario(spark, tmp_path)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_stateful_scenario(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    _write_batch(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        user_lifetime_totals(stream)
        .writeStream.format("memory")
        .queryName("lifetime")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.lifetime_events, r.lifetime_value)
           for r in spark.sql("SELECT * FROM lifetime").collect()}
    assert got == {1: (2, 15.0), 2: (1, 1.0)}

    # second batch arrives: state must carry over, not reset
    _write_batch(spark, src, [(1, 2.5), (3, 7.0)])
    q2 = (
        user_lifetime_totals(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        )
        .writeStream.format("memory")
        .queryName("lifetime2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = {r.user_id: (r.lifetime_events, r.lifetime_value)
            for r in spark.sql("SELECT * FROM lifetime2").collect()}
    # fresh checkpoint replays all files: totals include both batches
    assert got2[1] == (3, 17.5) and got2[3] == (1, 7.0)

    # batch fallback has identical semantics
    batch = user_lifetime_totals(spark.read.parquet(src))
    b = {r.user_id: (r.lifetime_events, r.lifetime_value) for r in batch.collect()}
    assert b == got2
