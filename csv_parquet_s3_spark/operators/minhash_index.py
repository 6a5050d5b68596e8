"""Incremental MinHash signature index: the materialized form of near-dup
detection for a continuously-growing corpus.

At 100 TB you never re-shingle the whole corpus per batch. The signature
table (doc_id, shingle set, NUM_PERMS min-hashes — `dedup.signature_table`)
IS the index: build it once, persist it as parquet, and on each ingest batch
compute signatures for the NEW documents only and MERGE them in
(`maintenance.upsert`). Pair generation then runs from the stored index with
zero re-shingling. This is the standard dedup-index lifecycle (build /
update / query) expressed as three dataframe functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.maintenance import upsert
from csv_parquet_s3_spark.operators.dedup import (
    signature_table,
    verified_pairs_from_signatures,
)


def _shingles_of(docs: DataFrame) -> DataFrame:
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(toks)-3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
            )
        ).alias("shingle"),
    )


def build_index(spark: SparkSession, docs: DataFrame, index_path: str) -> None:
    """Full build: signature rows for every document → parquet index."""
    signature_table(_shingles_of(docs)).write.mode("overwrite").parquet(index_path)


def update_index(spark: SparkSession, new_docs: DataFrame, index_path: str) -> tuple[int, int]:
    """Incremental build: signatures for the NEW batch only, merged by
    doc_id (re-ingested docs get fresh signatures). Cost is proportional to
    the batch, not the corpus. Returns (n_updated, n_inserted)."""
    sigs = signature_table(_shingles_of(new_docs))
    return upsert(spark, index_path, sigs, key="doc_id")


def pairs_from_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Jaccard-verified near-dup pairs straight from the stored index."""
    return verified_pairs_from_signatures(spark.read.parquet(index_path))
