"""Stream-stream interval join: click → purchase attribution with watermarks.

The hardest built-in Structured Streaming operator: both sides are unbounded,
so the join buffers each side's rows in state until the watermark proves no
matching row can still arrive. The event-time range condition
(``purchase within ATTRIBUTION_WINDOW after the click``) is what bounds the
state — without it a stream-stream join cannot evict anything.

Batch-equivalent semantics: on a bounded input the same expression tree is a
plain self-join with a time-range predicate, which is how the tests pin it.

Scale notes: state is keyed by user_id (one shuffle per side) and each side
evicts rows older than watermark + window — constant state per active user,
indefinitely runnable. Attribution fan-out (a purchase matches several
preceding clicks) is the semantics, not a bug; dedup-to-last-click is a
downstream ``row_number`` over the attribution output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "1 hour"
WATERMARK = "30 minutes"


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Join each purchase to the clicks of the same user in the preceding
    ``window``. Both inputs need (user_id, ts, value); streaming inputs get
    watermarks so join state is evictable."""
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond).select(
        "user_id", "click_ts", "purchase_ts", "purchase_value"
    )


def _outer_join(
    clicks: DataFrame,
    purchases: DataFrame,
    how: str,
    window: str,
    watermark: str,
) -> DataFrame:
    """Shared body of the three outer variants: watermark both sides, apply
    the interval condition, join with ``how``, and coalesce the key (an
    unmatched right row carries NULL in the left side's user_id)."""
    c = clicks.select(F.col("user_id"), F.col("ts").alias("click_ts"))
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond, how).select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def click_purchase_left_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """LEFT OUTER variant: every click, matched to its in-window purchases
    OR emitted once with NULL purchase columns — the "unconverted click"
    feed. The outer side is what makes this the hardest streaming join
    shape: a NULL-padded row may only emit when the watermark PROVES no
    matching purchase can still arrive (click_ts + window strictly below
    the joint watermark — verified empirically on this build: a click
    whose bound equals the watermark is NOT emitted), and that eviction
    runs one micro-batch late (the join uses the watermark committed by
    the previous batch — same SPARK-40925 lag the late-data operator
    documents). Matched rows still emit eagerly.

    Scale shape: identical to the inner join — state keyed by user_id,
    bounded by watermark + window per side."""
    return _outer_join(clicks, purchases, "leftOuter", window, watermark)


def click_purchase_right_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """RIGHT OUTER variant: every purchase, matched to its in-window
    preceding clicks OR emitted once with NULL click columns — the
    "unattributed purchase" feed (organic conversions). The eviction bound
    differs from the left side because the interval is one-sided: a
    purchase can only match clicks STRICTLY BEFORE it, so its NULL row may
    emit as soon as the joint watermark REACHES purchase_ts itself — no
    ``+ window`` term (the left side waits for click_ts + window because
    purchases up to that far ahead can still match), and INCLUSIVE at the
    boundary (a purchase exactly at the watermark emits; the left side's
    bound is strict — pinned in test_round8_wave.py). Matched rows still
    emit eagerly; the one-micro-batch eviction lag (SPARK-40925) applies
    the same way.

    Scale shape: identical — state keyed by user_id, the purchase side's
    state is evictable a full window EARLIER than the click side's."""
    return _outer_join(clicks, purchases, "rightOuter", window, watermark)


def click_purchase_full_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """FULL OUTER variant: the union of the three feeds — attributed pairs
    (eager), unconverted clicks (NULL purchase columns once the watermark
    strictly passes click_ts + window), and unattributed purchases (NULL
    click columns once it reaches purchase_ts, inclusive). Each side's
    NULL emission obeys ITS OWN eviction bound, so the two NULL
    populations appear at different watermark depths and with different
    boundary strictness — the oracle replays both cutoffs."""
    return _outer_join(clicks, purchases, "fullOuter", window, watermark)
