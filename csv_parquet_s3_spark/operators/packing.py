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

from pyspark.sql import DataFrame, SparkSession
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
