"""Sequence packing for LLM pretraining: greedily pack documents into
fixed-token context windows.

Training pipelines concatenate documents into fixed-length sequences (the
"packing" step) to avoid padding waste; at 100 TB this runs per shard, never
globally. The operator mirrors that shape exactly:

- documents are packed PER SOURCE (the shard key here), ordered by doc_id —
  a deterministic, append-stable order, so the packing is a pure function of
  the shard's contents;
- within a shard the classic greedy first-fit-in-order rule runs as a
  sequential fold: this is per-key imperative state, the textbook
  ``applyInPandas`` case (Arrow-batched, one pandas group per shard — the
  group is shard-sized by construction, never corpus-sized);
- the SQL oracle replays the same fold as a per-source recursive CTE, so the
  driver hash-checks every (doc → bin) assignment, not just counts.

Documents longer than the context window get a bin of their own (real
pipelines then split them downstream; the assignment stays deterministic).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

CONTEXT_TOKENS = 256  # window size, in whitespace tokens (test corpus scale)

_PACK_SCHEMA = "source string, doc_id bigint, n_tokens int, bin_id bigint"


def pack_greedy(docs: DataFrame) -> DataFrame:
    """(source, doc_id, n_tokens, bin_id): greedy packing per source shard."""
    context = CONTEXT_TOKENS

    # Defined as a closure (like the EWMA operator) so cloudpickle ships it
    # BY VALUE: Python workers under a vanilla driver session have no
    # /root/repo on their path and cannot re-import this module.
    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """Greedy first-fit-in-order packing of one shard. Sequential by
        construction, O(shard size); sorts by doc_id so the result is
        independent of Arrow batch arrival order."""
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, bin_id = [], None, 0
        for tok in pdf["n_tokens"]:
            if fill is None:
                fill = tok
            elif fill + tok > context:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["source", "doc_id", "n_tokens", "bin_id"]]

    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
    )
    return toks.groupBy("source").applyInPandas(pack_group, schema=_PACK_SCHEMA)


_PACK_ORACLE_CTE = f"""
    WITH RECURSIVE toks AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
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
    )"""


@register(
    "pack_documents_greedy",
    oracle=_PACK_ORACLE_CTE
    + """
    SELECT source, doc_id, n_tokens, bin_id FROM pack
    """,
)
def pack_documents_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment, hash-checked against the recursive
    greedy replay."""
    return pack_greedy(load_table(spark, sf_dir, "documents"))


@register(
    "pack_documents_efficiency",
    oracle=_PACK_ORACLE_CTE
    + f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(MAX(bin_id) + 1 AS BIGINT) AS n_bins,
           CAST(ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                / ((MAX(bin_id) + 1) * {CONTEXT_TOKENS}), 6) AS DOUBLE)
               AS fill_ratio
    FROM pack
    GROUP BY source
    """,
)
def pack_documents_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency per shard: bins used and achieved fill ratio —
    the metric a pipeline watches to decide window size / shuffling policy."""
    packed = pack_greedy(load_table(spark, sf_dir, "documents"))
    return packed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.max("bin_id") + 1).cast("bigint").alias("n_bins"),
        F.round(
            F.sum("n_tokens").cast("double")
            / ((F.max("bin_id") + 1) * CONTEXT_TOKENS),
            6,
        )
        .cast("double")
        .alias("fill_ratio"),
    )


@register(
    "pack_documents_consolidated",
    oracle=_PACK_ORACLE_CTE
    + f""",
    tails AS (
        SELECT p.source, p.bin_id, CAST(SUM(p.n_tokens) AS INT) AS fill
        FROM pack p
        JOIN (SELECT source, MAX(bin_id) AS mb FROM pack GROUP BY source) m
          ON m.source = p.source AND p.bin_id = m.mb
        GROUP BY p.source, p.bin_id
    ),
    ordered AS (
        SELECT source, bin_id, fill,
               ROW_NUMBER() OVER (ORDER BY source) AS rn
        FROM tails
    ),
    consol AS (
        SELECT source, bin_id, fill, rn,
               CAST(0 AS BIGINT) AS merged_group, fill AS gfill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.source, o.bin_id, o.fill, o.rn,
               CASE WHEN c.gfill + o.fill > {CONTEXT_TOKENS}
                    THEN c.merged_group + 1 ELSE c.merged_group END,
               CASE WHEN c.gfill + o.fill > {CONTEXT_TOKENS}
                    THEN o.fill ELSE c.gfill + o.fill END
        FROM consol c JOIN ordered o ON o.rn = c.rn + 1
    )
    SELECT source, bin_id, fill, merged_group FROM consol
    """,
)
def pack_documents_consolidated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-stage packing: per-shard greedy packing leaves each shard's
    LAST bin under-full; this consolidates those tail bins across shards
    into shared context windows (greedy fold over shard-ordered tail
    fills) — the global step that recovers the padding a purely per-shard
    packing wastes.

    Scale shape: stage 1 is the per-shard fold; stage 2's input is ONE ROW
    PER SHARD (the tail bin's fill), so the cross-shard fold runs over a
    shard-count-sized frame in a single bounded task — at thousands of
    shards, group by a shard-prefix first and consolidate hierarchically.
    Both folds replay exactly in the recursive-CTE oracle."""
    packed = pack_greedy(load_table(spark, sf_dir, "documents"))
    fills = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").cast("int").alias("fill")
    )
    tails = fills.join(
        packed.groupBy("source").agg(F.max("bin_id").alias("bin_id")),
        ["source", "bin_id"],
    )
    context = CONTEXT_TOKENS
    schema = "source string, bin_id bigint, fill int, merged_group bigint"

    def consolidate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("source").reset_index(drop=True)
        groups, gfill, group = [], None, 0
        for fill in pdf["fill"]:
            if gfill is None:
                gfill = fill
            elif gfill + fill > context:
                group += 1
                gfill = fill
            else:
                gfill += fill
            groups.append(group)
        pdf["merged_group"] = pd.Series(groups, dtype="int64")
        return pdf[["source", "bin_id", "fill", "merged_group"]]

    return (
        tails.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda pdf: consolidate(pdf), schema=schema)
    )


# ---------------------------------------------------------------------------
# Length-bucketed inference batching: the padding-minimization counterpart
# of training-time sequence packing. Batch cost is max_len × batch_size, so
# batching SIMILAR lengths together is what controls wasted compute.
# ---------------------------------------------------------------------------
BATCH_SIZE = 16
N_LEN_BUCKETS = 4
_LEN_PS = [i / N_LEN_BUCKETS for i in range(1, N_LEN_BUCKETS)]


@register(
    "batch_by_length_buckets",
    oracle=f"""
    WITH b AS (
        SELECT quantile_cont(n_chars, {_LEN_PS}) AS qs FROM documents
    ),
    assigned AS (
        SELECT d.doc_id, d.n_chars,
               CASE WHEN d.n_chars <= b.qs[1] THEN 0
                    WHEN d.n_chars <= b.qs[2] THEN 1
                    WHEN d.n_chars <= b.qs[3] THEN 2
                    ELSE 3 END AS bucket
        FROM documents d, b
    ),
    batched AS (
        SELECT doc_id, n_chars, bucket,
               CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n_chars, doc_id)
                     - 1) // {BATCH_SIZE} AS INT) AS batch_id
        FROM assigned
    )
    SELECT CAST(bucket AS INT) AS bucket, batch_id,
           COUNT(*) AS n_docs,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(ROUND(1.0 - CAST(SUM(n_chars) AS DOUBLE)
                            / (COUNT(*) * MAX(n_chars)), 6) AS DOUBLE)
               AS padding_frac
    FROM batched GROUP BY bucket, batch_id
    """,
)
def batch_by_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference batch plan: equi-depth length buckets (exact quantile
    boundaries — one scalar aggregate broadcast back, the same
    no-global-ntile discipline as curriculum_length_shards), then
    length-sorted batches of {BATCH_SIZE} within each bucket; reports the
    padding fraction each batch wastes (1 − Σlen / (n·max_len)).

    Scale shape: the per-bucket ROW_NUMBER windows partition by bucket —
    {N_LEN_BUCKETS} independent sorts, each 1/{N_LEN_BUCKETS} of the corpus,
    NOT one global sort. At 100 TB the refinement is finer boundaries (more
    buckets → smaller windows) — the plan shape is unchanged; batch ids
    within a bucket stay deterministic under the (n_chars, doc_id) total
    order.
    """
    docs = load_table(spark, sf_dir, "documents")
    ps = ", ".join(str(p) for p in _LEN_PS)
    b = docs.agg(F.expr(f"percentile(n_chars, array({ps}))").alias("qs"))
    bucket = (
        F.when(F.col("n_chars") <= F.element_at("qs", 1), 0)
        .when(F.col("n_chars") <= F.element_at("qs", 2), 1)
        .when(F.col("n_chars") <= F.element_at("qs", 3), 2)
        .otherwise(3)
    )
    assigned = (
        docs.crossJoin(F.broadcast(b))
        .select("doc_id", "n_chars", bucket.cast("int").alias("bucket"))
    )
    wb = W.partitionBy("bucket").orderBy("n_chars", "doc_id")
    batched = assigned.withColumn(
        "batch_id",
        ((F.row_number().over(wb) - 1) / BATCH_SIZE).cast("int"),
    )
    return batched.groupBy("bucket", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
        F.round(
            1.0 - F.sum("n_chars").cast("double") / (F.count("*") * F.max("n_chars")), 6
        )
        .cast("double")
        .alias("padding_frac"),
    )
