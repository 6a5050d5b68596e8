"""Grouped-map Pandas operators (``applyInPandas``): per-key algorithms the
built-in SQL surface genuinely cannot express.

An exponentially-weighted moving average is *recursive* — each output
depends on the previous output (y_t = a·x_t + (1-a)·y_{t-1}) — which no
window frame can express (frames aggregate inputs, not prior outputs). This
is the canonical justification for dropping to a grouped Pandas UDF; scoring
models, per-entity state machines, and sessionized feature rollouts share
the same shape.

Scale notes: one shuffle on the group key; each group materializes as one
Arrow batch in a Python worker, so the bound is max-rows-per-key (events per
user), not corpus size. Skewed keys → salt or pre-split by time range. The
batch function is a nested closure so cloudpickle ships it by value — the
Python workers don't need this package importable.

Hash-checked against a DuckDB recursive-CTE oracle replaying the identical
recurrence; the test suite additionally pins it against a pure-pandas model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

EWMA_ALPHA = 0.3

EWMA_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, value double, ewma_value double"
)


def user_value_ewma(events: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """Per-user EWMA of event values in (ts, event_id) order."""
    a = alpha

    def ewma_group(pdf):
        import pandas as pd  # noqa: F401  (worker-side import)

        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # UNROUNDED on purpose: the adjust=False recurrence is bit-identical
        # to the oracle's recursive CTE (verified at sf0.01 and sf0.1), while
        # decimal rounding would reintroduce engine-specific tie-breaking
        # (numpy half-even vs SQL half-away) at exact .5e-6 boundaries.
        pdf["ewma_value"] = pdf["value"].ewm(alpha=a, adjust=False).mean()
        return pdf[["user_id", "event_id", "ts", "value", "ewma_value"]]

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(ewma_group, schema=EWMA_SCHEMA)
    )


@register(
    "q_events_user_ewma",
    # The recurrence IS SQL-expressible via a recursive CTE; DuckDB replays
    # pandas' adjust=False update y_t = (1-a)*y_{t-1} + a*x_t with the same
    # IEEE double ops — bit-exact UNROUNDED (verified at sf0.01 and sf0.1;
    # rounding would differ at exact ties: numpy half-even vs SQL half-away).
    # Depth = max events per key.
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    ewma AS (
      SELECT user_id, event_id, ts, value, rn, value AS y
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
             (1 - {EWMA_ALPHA}) * e.y + {EWMA_ALPHA} * o.value
      FROM ordered o JOIN ewma e ON o.user_id = e.user_id AND o.rn = e.rn + 1
    )
    SELECT user_id, event_id, ts, value, y AS ewma_value
    FROM ewma
    """,
)
def q_events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_value_ewma(load_table(spark, sf_dir, "events"))
