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
