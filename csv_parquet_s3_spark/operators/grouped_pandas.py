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


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend): the next step up from
# EWMA for short-horizon forecasting. Same recursive shape — each state
# depends on the previous output — so it lives in the same grouped-Pandas
# slot, with the same recursive-CTE oracle discipline.
# ---------------------------------------------------------------------------
HOLT_ALPHA = 0.4  # level smoothing
HOLT_BETA = 0.2   # trend smoothing

HOLT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, value double,"
    " level double, trend double, forecast_next double"
)


def user_value_holt(
    events: DataFrame, alpha: float = HOLT_ALPHA, beta: float = HOLT_BETA
) -> DataFrame:
    """Per-user Holt smoothing of event values in (ts, event_id) order:
    l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1}), b_t = β(l_t − l_{t−1}) +
    (1−β)b_{t−1}, initialized l_1 = y_1, b_1 = 0. ``forecast_next`` is the
    one-step-ahead point forecast l_t + b_t. UNROUNDED like the EWMA: both
    engines run the identical IEEE double expression order, so the raw
    doubles agree bit-for-bit and rounding would only reintroduce
    half-even-vs-half-away tie divergence."""
    a, bb = alpha, beta

    def holt_group(pdf):
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        levels, trends = [], []
        l = b = None
        for y in pdf["value"]:
            if l is None:
                l, b = y, 0.0
            else:
                l_prev = l
                l = a * y + (1 - a) * (l + b)
                b = bb * (l - l_prev) + (1 - bb) * b
            levels.append(l)
            trends.append(b)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["forecast_next"] = pdf["level"] + pdf["trend"]
        return pdf[
            ["user_id", "event_id", "ts", "value", "level", "trend", "forecast_next"]
        ]

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(holt_group, schema=HOLT_SCHEMA)
    )


@register(
    "q_events_user_holt",
    oracle=f"""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    holt AS (
      SELECT user_id, event_id, ts, value, rn,
             value AS l, CAST(0.0 AS DOUBLE) AS b,
             CAST(NULL AS DOUBLE) AS l_prev
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
             {HOLT_ALPHA} * o.value + (1 - {HOLT_ALPHA}) * (h.l + h.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * o.value
                 + (1 - {HOLT_ALPHA}) * (h.l + h.b)) - h.l)
                 + (1 - {HOLT_BETA}) * h.b,
             h.l
      FROM ordered o JOIN holt h ON o.user_id = h.user_id AND o.rn = h.rn + 1
    )
    SELECT user_id, event_id, ts, value, l AS level, b AS trend,
           l + b AS forecast_next
    FROM holt
    """,
)
def q_events_user_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt level+trend state and one-step forecast over the event
    value stream — the forecasting primitive behind burn-rate and demand
    alerts, as a hash-checked query.

    Scale shape: one shuffle on user_id; each user's series folds
    sequentially inside its Arrow batch (recursion is inherently
    per-series; SERIES COUNT is the parallelism axis, which is exactly how
    a forecasting fleet at 100 TB distributes). The oracle replays the
    identical recurrence as a recursive CTE, depth = max events per user,
    bit-exact unrounded (same discipline as `q_events_user_ewma`)."""
    return user_value_holt(load_table(spark, sf_dir, "events"))
