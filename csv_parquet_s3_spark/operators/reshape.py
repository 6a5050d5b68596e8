"""Reshaping / frame-based operators: time-RANGE window frames and unpivot.

Neither shape exists in the reference (it has no window or reshape operators
at all, SURVEY.md §2.2); both are driver-mandated taxonomy entries:

- RANGE frame: per-event trailing-window aggregate keyed by *event time*,
  not row position — the shape behind rate limiting, rolling spend, and
  trailing-window features. One shuffle on the partition key; the frame scan
  is per-partition and streaming (no materialized self-join).
- Unpivot via ``stack()``: wide→long reshaping ahead of a metric-wise
  aggregate — Catalyst compiles it to a Generate (no shuffle), so the only
  exchange is the final small groupBy.

Money/value math uses DECIMAL so windowed sums are order-independent and
hash-match the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

_HOUR_US = 3_600_000_000  # one hour in microseconds


@register(
    "q_events_trailing_hour",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS trailing_1h_value
    FROM events
    """,
)
def q_events_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour spend per user at every event — a RANGE frame over
    event-time microseconds (sub-second precision preserved; a seconds cast
    would shift frame boundaries)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum(F.expr("CAST(value AS DECIMAL(12,2))")).over(w), 2)
        .cast("double")
        .alias("trailing_1h_value"),
    )


@register(
    "q_unpivot_lineitem_metrics",
    oracle="""
    SELECT metric,
           CAST(ROUND(SUM(val), 2) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM (
        SELECT 'extendedprice' AS metric,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS val FROM lineitem
        UNION ALL
        SELECT 'discount', CAST(l_discount AS DECIMAL(12,2)) FROM lineitem
        UNION ALL
        SELECT 'tax', CAST(l_tax AS DECIMAL(12,2)) FROM lineitem
    ) long
    GROUP BY metric
    """,
)
def q_unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (``stack``) then metric-wise totals; the unpivot is
    a Generate node — zero shuffle until the 3-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(3,"
            " 'extendedprice', CAST(l_extendedprice AS DECIMAL(12,2)),"
            " 'discount', CAST(l_discount AS DECIMAL(12,2)),"
            " 'tax', CAST(l_tax AS DECIMAL(12,2))"
            ") AS (metric, val)"
        )
    )
    return long.groupBy("metric").agg(
        F.expr("CAST(ROUND(SUM(val), 2) AS DOUBLE)").alias("total"),
        F.count("*").alias("n"),
    )
