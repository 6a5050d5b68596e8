"""End-to-end corpus assembly: the composition a training-data pipeline
actually ships, as ONE registered, hash-checked query.

Stages (each individually registered and oracle-checked elsewhere; this op
pins their COMPOSITION, where stage-ordering bugs live):

1. exact dedup — keep the lowest doc_id per content hash (dedup.py);
2. quality gate — deterministic hash-Bernoulli keep with probability
   min(1, n_chars/512) (sampling.py);
3. language rebalance — downsample every language toward the smallest
   stratum, with thresholds computed ON THE SURVIVING SET (the composition
   subtlety: rebalancing before dedup would count duplicates into the
   mixture);
4. sequence packing — greedy fixed-window packing per source shard
   (packing.py), emitting the final (doc -> context window) assignment.

Scale shape: stages 1–3 are hash-keyed aggregations + map-side filters
(nothing materializes between stages — Catalyst fuses the filters into one
pass over the corpus); stage 4 is the per-shard applyInPandas fold. The
oracle chains the same four stages as CTEs, so the driver hash-checks every
final assignment of the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.packing import CONTEXT_TOKENS, pack_greedy
from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.operators.sampling import (
    _DOC_HASH_DUCK,
    _DOC_HASH_SPARK,
    QUALITY_SCALE,
)
from csv_parquet_s3_spark.sources.tables import load_table
from csv_parquet_s3_spark.plans.materialize import materialize


@register(
    "pipeline_corpus_training_set",
    oracle=f"""
    WITH RECURSIVE s1 AS (
        SELECT doc_id, text, lang, source, n_chars FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn1
            FROM documents
        ) z WHERE rn1 = 1
    ),
    s2 AS (
        SELECT * FROM s1
        WHERE {_DOC_HASH_DUCK} * {QUALITY_SCALE}
              < LEAST(n_chars, {QUALITY_SCALE}) * {16 ** 8}
    ),
    counts AS (SELECT lang, COUNT(*) AS n_lang FROM s2 GROUP BY lang),
    target AS (SELECT MIN(n_lang) AS t FROM counts),
    thr AS (
        SELECT lang,
               CAST((CAST(t AS HUGEINT) * {16 ** 8} - 1) // n_lang AS BIGINT)
                   AS keep_max
        FROM counts CROSS JOIN target
    ),
    s3 AS (
        SELECT s2.* FROM s2
        JOIN thr ON thr.lang = s2.lang
        WHERE {_DOC_HASH_DUCK} <= thr.keep_max
    ),
    toks AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM s3
    ),
    pack AS (
        SELECT source, doc_id, n_tokens, rn,
               CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.source, t.doc_id, t.n_tokens, t.rn,
               CASE WHEN p.fill + t.n_tokens > {CONTEXT_TOKENS}
                    THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.fill + t.n_tokens > {CONTEXT_TOKENS}
                    THEN t.n_tokens ELSE p.fill + t.n_tokens END
        FROM pack p JOIN toks t ON t.source = p.source AND t.rn = p.rn + 1
    )
    SELECT source, doc_id, n_tokens, bin_id FROM pack
    """,
)
def pipeline_corpus_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final (source, doc_id, n_tokens, bin_id) training-set assignment from
    the four-stage corpus pipeline described in the module docstring. Every
    stage is a pure function of the data (content hashes, no RNG), so the
    composition is reproducible end-to-end — re-running on an appended
    corpus re-derives the same assignments for surviving documents' shards.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    # one shuffle on the 32-char digest (never on text), rn=1 keeps the
    # lowest doc_id per content hash — no corpus-sized join side.
    w1 = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    s1 = (
        docs.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") == 1)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    # localCheckpoint: s2 feeds both the language counts and the final
    # rebalance filter — un-checkpointed, each reference replays the
    # content-digest dedup window shuffle; counts likewise feeds the target
    # scalar and the thresholds.
    s2 = s1.filter(
        F.expr(
            f"{_DOC_HASH_SPARK} * {QUALITY_SCALE}"
            f" < least(n_chars, {QUALITY_SCALE}) * {16 ** 8}"
        )
    ).transform(materialize)
    counts = s2.groupBy("lang").agg(F.count("*").alias("n_lang")).transform(materialize)
    target = counts.agg(F.min("n_lang").alias("t"))
    thr = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        F.floor(
            (F.col("t").cast("decimal(38,0)") * (16 ** 8) - 1) / F.col("n_lang")
        )
        .cast("bigint")
        .alias("keep_max"),
    )
    s3 = (
        s2.join(F.broadcast(thr), "lang")
        .filter(F.expr(_DOC_HASH_SPARK) <= F.col("keep_max"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    return pack_greedy(s3)


@register(
    "pipeline_customer_feature_snapshot",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS total_spend,
               CAST((2 * SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                  AS BIGINT)) + COUNT(*))
                    // (2 * COUNT(*)) AS DOUBLE) / 100 AS avg_order_value,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order,
               CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                    AS INT) AS days_active,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_open_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_mktsegment, n.n_name AS nation,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(o.total_spend, 0.0) AS total_spend,
           o.avg_order_value,
           o.first_order, o.last_order, o.days_active,
           CAST(COALESCE(o.n_open_orders, 0) AS BIGINT) AS n_open_orders
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    LEFT JOIN o ON o.o_custkey = c.c_custkey
    """,
)
def pipeline_customer_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer feature snapshot — the feature-store materialization a
    model-serving pipeline refreshes on schedule: activity counts, exact
    DECIMAL spend aggregates, recency bounds, open-order exposure, joined
    with the dimension attributes. One fact aggregation keyed by customer,
    one broadcast dim join, one left join back to the spine (customers
    WITHOUT orders stay in the table with zeroed counts — the spine defines
    the population, not the fact). Null avg/first/last for orderless
    customers is deliberate: absent history is not a zero feature."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dec = F.expr("CAST(o_totalprice AS DECIMAL(12,2))")
    # avg in integer half-up cents: decimal-division scale/rounding rules
    # differ per engine at exact half-cent quotients; (2·cents + n) div 2n
    # is the same integer everywhere.
    avg_cents = F.expr(
        "CAST((2 * SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
        " + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE) / 100"
    )
    o = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(dec), 2).cast("double").alias("total_spend"),
        avg_cents.alias("avg_order_value"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate"))
        .cast("int")
        .alias("days_active"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("bigint")
        .alias("n_open_orders"),
    )
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(o, customer.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            "avg_order_value",
            "first_order",
            "last_order",
            "days_active",
            F.coalesce("n_open_orders", F.lit(0))
            .cast("bigint")
            .alias("n_open_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Trailing-window user features: the time-windowed half of the feature
# store. `pipeline_customer_feature_snapshot` materializes point-in-time
# static features; training a churn/propensity model additionally needs
# rolling aggregates ("events in the last 7 days", "spend in the last 7
# days", "days since last purchase") computed AS OF each activity day —
# the textbook RANGE-window feature table.
# ---------------------------------------------------------------------------
FEAT_WINDOW_DAYS = 7

_EV_CENTS_FEAT = (
    "CAST(CAST(value AS DECIMAL(12,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)"
)


@register(
    "pipeline_user_rolling_features",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, day,
               date_diff('day', DATE '1990-01-01', CAST(day AS DATE)) AS di,
               COUNT(*) AS n_events,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN {_EV_CENTS_FEAT} ELSE 0 END) AS p_cents,
               MAX(CASE WHEN event_type = 'purchase'
                        THEN date_diff('day', DATE '1990-01-01', CAST(day AS DATE))
                   END) AS p_di
        FROM (SELECT *, date_trunc('day', ts) AS day FROM events)
        GROUP BY user_id, day
    )
    SELECT user_id, day,
           CAST(SUM(n_events) OVER w7 AS BIGINT) AS n_events_7d,
           CAST(SUM(p_cents) OVER w7 AS BIGINT) AS purchase_cents_7d,
           CAST(di - MAX(p_di) OVER wall AS BIGINT) AS days_since_purchase
    FROM daily
    WINDOW w7 AS (PARTITION BY user_id ORDER BY di
                  RANGE BETWEEN {FEAT_WINDOW_DAYS - 1} PRECEDING
                        AND CURRENT ROW),
           wall AS (PARTITION BY user_id ORDER BY di
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def pipeline_user_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, active day): trailing-{FEAT_WINDOW_DAYS}-day event count
    and purchase spend (exact cents), plus days since the last purchase —
    NULL while the user has never purchased, never a sentinel that a model
    would mistake for a real gap. Each row uses only data at or before its
    day: the same no-look-ahead contract as `scd2_point_in_time_join`, which
    is what makes the table safe to join to labels dated the same day.

    Scale shape: one corpus-sized aggregate to user-day grain (map-side
    combined), then RANGE windows over the user's own days — one shuffle on
    user_id total; per-user frames are bounded by active-day counts. The
    day index is an integer (days since an epoch), so the RANGE frame is a
    true value-range window, not a row count — gaps in activity shrink the
    window exactly as the semantics require."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.expr(_EV_CENTS_FEAT))
            .otherwise(0)
        ).alias("p_cents"),
        F.max(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("datediff(CAST(ts AS DATE), DATE '1990-01-01')"),
            )
        ).alias("p_di"),
    ).withColumn("di", F.expr("datediff(CAST(day AS DATE), DATE '1990-01-01')"))
    w7 = (
        W.partitionBy("user_id")
        .orderBy("di")
        .rangeBetween(-(FEAT_WINDOW_DAYS - 1), 0)
    )
    wall = (
        W.partitionBy("user_id").orderBy("di").rangeBetween(W.unboundedPreceding, 0)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum("n_events").over(w7).cast("bigint").alias("n_events_7d"),
        F.sum("p_cents").over(w7).cast("bigint").alias("purchase_cents_7d"),
        (F.col("di") - F.max("p_di").over(wall)).cast("bigint").alias(
            "days_since_purchase"
        ),
    )
