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
    s2 = s1.filter(
        F.expr(
            f"{_DOC_HASH_SPARK} * {QUALITY_SCALE}"
            f" < least(n_chars, {QUALITY_SCALE}) * {16 ** 8}"
        )
    )
    counts = s2.groupBy("lang").agg(F.count("*").alias("n_lang"))
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
