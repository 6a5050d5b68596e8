"""Incremental MinHash index: build-half + update-half must equal full build,
and index-based pairs must equal the direct (re-shingling) operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.dedup import dedup_minhash_lsh_pairs
from csv_parquet_s3_spark.operators.minhash_index import (
    build_index,
    pairs_from_index,
    update_index,
)
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _pairs_key(df):
    return sorted(
        (r.doc_id_a, r.doc_id_b, r.jaccard) for r in df.collect()
    )


def test_incremental_index_equals_full_build(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "sig_index")

    build_index(spark, docs.filter(F.col("doc_id") % 2 == 0), idx)
    n_updated, n_inserted = update_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx
    )
    assert n_updated == 0 and n_inserted > 0

    got = _pairs_key(pairs_from_index(spark, idx))
    want = _pairs_key(dedup_minhash_lsh_pairs(spark, SF))
    assert got == want and len(want) > 0

    # re-ingesting a batch refreshes in place (idempotent, no duplicates)
    n_updated2, n_inserted2 = update_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx
    )
    assert n_inserted2 == 0 and n_updated2 == n_inserted
    assert _pairs_key(pairs_from_index(spark, idx)) == want


def test_batch_vs_index_pairs(spark, tmp_path):
    """Dedup of a new batch against the corpus: batch-vs-index pairs must
    equal the cross-half subset of the full pair set."""
    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / "sig_index2")
    build_index(spark, docs.filter(F.col("doc_id") % 2 == 0), idx)

    from csv_parquet_s3_spark.operators.minhash_index import pairs_against_index

    new_batch = docs.filter(F.col("doc_id") % 2 == 1)
    got = sorted(
        (min(r.new_doc_id, r.index_doc_id), max(r.new_doc_id, r.index_doc_id), r.jaccard)
        for r in pairs_against_index(spark, new_batch, idx).collect()
    )
    # reference: full-corpus pairs restricted to one-even-one-odd pairs
    want = sorted(
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in dedup_minhash_lsh_pairs(spark, SF).collect()
        if (r.doc_id_a % 2) != (r.doc_id_b % 2)
    )
    assert got == want and len(want) > 0
