"""Invariants for sequence packing and the deterministic sampling family
(beyond the driver's hash-vs-oracle check, which pins exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.packing import CONTEXT_TOKENS, pack_greedy
from csv_parquet_s3_spark.operators.sampling import (
    rebalance_documents_by_lang,
    sample_documents_quality_weighted,
)
from csv_parquet_s3_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_pack_bins_respect_context_window(spark):
    """Every bin fits the window unless it holds a single oversized doc."""
    packed = pack_greedy(load_table(spark, SF_CORRECTNESS, "documents"))
    bins = (
        packed.groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n_docs"))
        .collect()
    )
    assert bins
    for b in bins:
        assert b.fill <= CONTEXT_TOKENS or b.n_docs == 1, (
            f"bin {b.source}/{b.bin_id}: fill {b.fill} exceeds "
            f"{CONTEXT_TOKENS} with {b.n_docs} docs"
        )


def test_pack_bins_are_contiguous_and_greedy(spark):
    """bin_id is dense from 0 per source, docs in doc_id order, and greedy:
    the first doc of bin k+1 would NOT have fit into bin k."""
    packed = pack_greedy(load_table(spark, SF_CORRECTNESS, "documents"))
    rows = sorted(packed.collect(), key=lambda r: (r.source, r.doc_id))
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, docs in by_source.items():
        fills = {}
        prev_bin = 0
        for r in docs:
            assert r.bin_id in (prev_bin, prev_bin + 1), (
                f"{source}: bin_id jumps {prev_bin} -> {r.bin_id}"
            )
            if r.bin_id == prev_bin + 1:
                # greedy: the doc must not have fit in the previous bin
                assert fills[prev_bin] + r.n_tokens > CONTEXT_TOKENS
            prev_bin = r.bin_id
            fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
        assert min(fills) == 0  # dense from 0


def test_pack_deterministic_across_runs(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    a = sorted(map(tuple, pack_greedy(docs).collect()))
    b = sorted(map(tuple, pack_greedy(docs).collect()))
    assert a == b


def test_quality_weighted_keep_rate_tracks_weight(spark):
    """Longer docs must survive at a (weakly) higher realized rate, and the
    overall rate must be near E[min(1, n_chars/512)]."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    kept = sample_documents_quality_weighted(spark, SF_CORRECTNESS)
    stats = (
        docs.withColumn("long", F.col("n_chars") >= 384)
        .join(kept.select("doc_id", F.lit(1).alias("k")), "doc_id", "left")
        .groupBy("long")
        .agg(F.avg(F.coalesce("k", F.lit(0))).alias("rate"))
        .collect()
    )
    rate = {r.long: r.rate for r in stats}
    assert rate[True] > rate[False]
    expected = (
        docs.agg(
            F.avg(F.least(F.col("n_chars"), F.lit(512)) / F.lit(512.0))
        ).collect()[0][0]
    )
    realized = kept.count() / docs.count()
    assert abs(realized - expected) < 0.08, (realized, expected)


def test_rebalance_flattens_language_skew(spark):
    """Every language lands near the smallest language's size."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    target = docs.groupBy("lang").count().agg(F.min("count")).collect()[0][0]
    out = (
        rebalance_documents_by_lang(spark, SF_CORRECTNESS)
        .groupBy("lang")
        .count()
        .collect()
    )
    langs = docs.select("lang").distinct().count()
    assert len(out) == langs
    for r in out:
        # hash-Bernoulli at rate target/n_lang: allow ~4 sigma slack
        assert abs(r["count"] - target) <= max(4 * (target**0.5), 5), (
            r.lang,
            r["count"],
            target,
        )
