"""Split stability and stratified sampling rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.sampling import hash_split, sample_documents_stratified
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_hash_split_is_stable_and_roughly_80_10_10(spark):
    docs = load_table(spark, SF, "documents")
    s1 = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    s2 = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    assert s1 == s2  # pure function of the row
    n = len(s1)
    train = sum(1 for v in s1.values() if v == "train") / n
    assert 0.70 < train < 0.90  # 500 docs → loose band around 0.80


def test_hash_split_stable_under_append(spark):
    """New rows never move old rows between splits."""
    docs = load_table(spark, SF, "documents")
    subset = docs.filter(F.col("doc_id") < 100)
    sub_split = {r.doc_id: r.split for r in hash_split(subset, "doc_id").collect()}
    full_split = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    assert all(full_split[k] == v for k, v in sub_split.items())


def test_stratified_sample_rates(spark):
    docs = load_table(spark, SF, "documents")
    before = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    dominant = max(sorted(before), key=lambda k: before[k])
    sampled = sample_documents_stratified(spark, SF)
    after = {r.lang: r["count"] for r in sampled.groupBy("lang").count().collect()}
    # non-dominant strata kept whole; dominant cut to ~30%
    for lang, n in before.items():
        if lang == dominant:
            assert after.get(lang, 0) < 0.6 * n
        else:
            assert after.get(lang) == n
