"""Invariant tests for the r05 late-addition operators: exact-substring span
dedup, Bloom blocklist screening, PageRank, salted join, curriculum shards.

These pin the semantic guarantees the differential oracle can't express:
planted duplicates MUST be found, Bloom filters MUST NOT false-negative,
PageRank mass MUST be conserved, salting MUST be result-invariant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.components import pagerank
from csv_parquet_s3_spark.operators.dedup import (
    BLOOM_K,
    SPAN_N,
    bloom_probe,
    dup_span_fractions,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Exact-substring spans
# ---------------------------------------------------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_duplicate_span_found(spark):
    """Two docs sharing an exact SPAN_N-token run: exactly that run's tokens
    are marked duplicated in both docs, nothing else."""
    shared = " ".join(f"dup{i}" for i in range(SPAN_N))  # exactly one window
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"x0 x1 x2 {shared} y0"),
        (3, "an entirely unrelated document with no repeated windows at all"),
    ]
    out = {
        r["doc_id"]: r
        for r in dup_span_fractions(_docs(spark, rows)).collect()
    }
    assert out[1]["n_dup_tokens"] == SPAN_N
    assert out[2]["n_dup_tokens"] == SPAN_N
    assert out[3]["n_dup_tokens"] == 0
    assert out[3]["dup_fraction"] == 0.0
    assert out[1]["n_tokens"] == SPAN_N + 4


def test_overlapping_duplicate_windows_union_coverage(spark):
    """A shared (SPAN_N+2)-token run yields 3 duplicated windows whose
    coverage UNION is SPAN_N+2 tokens — positions are distinct-counted,
    not double-counted per window."""
    run = " ".join(f"r{i}" for i in range(SPAN_N + 2))
    rows = [(1, f"{run} tail1 tail2"), (2, f"head1 {run}")]
    out = {r["doc_id"]: r for r in dup_span_fractions(_docs(spark, rows)).collect()}
    assert out[1]["n_dup_tokens"] == SPAN_N + 2
    assert out[2]["n_dup_tokens"] == SPAN_N + 2


def test_within_doc_repetition_is_not_cross_doc_duplication(spark):
    """A window repeated INSIDE one doc only (distinct-doc count = 1) is not
    flagged — the operator measures cross-document duplication."""
    run = " ".join(f"w{i}" for i in range(SPAN_N))
    rows = [(1, f"{run} bridge {run}"), (2, "nothing shared here at all ok")]
    out = {r["doc_id"]: r for r in dup_span_fractions(_docs(spark, rows)).collect()}
    assert out[1]["n_dup_tokens"] == 0


def test_short_docs_have_no_windows(spark):
    rows = [(1, "too short"), (2, "too short")]  # identical but < SPAN_N tokens
    out = {r["doc_id"]: r for r in dup_span_fractions(_docs(spark, rows)).collect()}
    assert out[1]["n_dup_tokens"] == 0 and out[2]["n_dup_tokens"] == 0


# ---------------------------------------------------------------------------
# Bloom blocklist
# ---------------------------------------------------------------------------
def test_bloom_no_false_negatives(spark):
    """Every candidate whose text IS in the blocklist must probe all
    BLOOM_K bits set — the Bloom guarantee, independent of filter width."""
    block_rows = [(100 + i, f"blocked document number {i}") for i in range(40)]
    cand_rows = block_rows + [(500 + i, f"fresh document number {i}") for i in range(40)]
    block = spark.createDataFrame(block_rows, "doc_id bigint, text string")
    cand = spark.createDataFrame(cand_rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["hits"] for r in bloom_probe(cand, block).collect()}
    for doc_id, _ in block_rows:
        assert got[doc_id] == BLOOM_K, f"false negative for {doc_id}"


def test_bloom_empty_blocklist_flags_nothing(spark):
    cand = spark.createDataFrame(
        [(1, "anything"), (2, "else")], "doc_id bigint, text string"
    )
    block = cand.filter(F.lit(False))
    got = bloom_probe(cand, block).filter(F.col("hits") == BLOOM_K).count()
    assert got == 0


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
def _graph(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "node string")
    e = spark.createDataFrame(edges, "src string, dst string, share double")
    return n, e


@pytest.mark.slow
def test_pagerank_mass_conserved(spark):
    n, e = _graph(
        spark,
        ["a", "b", "c", "d"],
        [("a", "b", 1.0), ("b", "c", 0.7), ("b", "a", 0.3), ("c", "a", 1.0)],
    )  # d is dangling
    ranks = pagerank(n, e, n_iters=4)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


@pytest.mark.slow
def test_pagerank_symmetric_cycle_is_uniform(spark):
    """A symmetric ring (everyone passes all mass to the next node) has the
    uniform distribution as its fixed point — iteration must preserve it."""
    nodes = ["a", "b", "c", "d", "e"]
    edges = [
        (nodes[i], nodes[(i + 1) % len(nodes)], 1.0) for i in range(len(nodes))
    ]
    n, e = _graph(spark, nodes, edges)
    ranks = pagerank(n, e, n_iters=6)
    for r in ranks.collect():
        assert r["rank"] == pytest.approx(1.0 / len(nodes), abs=1e-12)


@pytest.mark.slow
def test_pagerank_sink_attracts_mass(spark):
    """In a -> b -> c (c dangling), rank must be increasing along the chain
    after enough iterations with damping < 1? No — c re-emits uniformly; the
    robust property: b outranks a (everything a has flows to b, a only gets
    the uniform share)."""
    n, e = _graph(spark, ["a", "b", "c"], [("a", "b", 1.0), ("b", "c", 1.0)])
    got = {r["node"]: r["rank"] for r in pagerank(n, e, n_iters=10).collect()}
    assert got["c"] > got["b"] > got["a"] * 0.999


# ---------------------------------------------------------------------------
# Salted join result-invariance and curriculum shard exhaustiveness
# (differential vs the in-registry plain formulations at test SF).
# ---------------------------------------------------------------------------
def test_salted_join_equals_plain_join(spark):
    from csv_parquet_s3_spark.operators.relational import q_salted_brand_revenue
    from csv_parquet_s3_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.expr(
                "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))), 2)"
                " AS DOUBLE)"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    salted = q_salted_brand_revenue(spark, SF)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_curriculum_shards_partition_the_corpus(spark):
    from csv_parquet_s3_spark.operators.sampling import (
        CURRICULUM_SHARDS,
        curriculum_length_shards,
    )
    from csv_parquet_s3_spark.sources.tables import load_table

    rows = curriculum_length_shards(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # exhaustive partition
    assert {r["shard"] for r in rows} <= set(range(CURRICULUM_SHARDS))
    # shards are ordered by length: max of shard k <= min of shard k+1
    by_shard = sorted(rows, key=lambda r: r["shard"])
    for lo, hi in zip(by_shard, by_shard[1:]):
        assert lo["max_chars"] <= hi["min_chars"]


# ---------------------------------------------------------------------------
# Winnowing guarantee (Schleimer et al. §2: any match of length >= W + K - 1
# shares at least one fingerprint).
# ---------------------------------------------------------------------------
def test_winnowing_guarantee_on_planted_run(spark):
    from csv_parquet_s3_spark.operators.textstats import (
        WINNOW_K,
        WINNOW_W,
        text_winnowing_fingerprints,
    )
    import csv_parquet_s3_spark.sources.tables as tables

    run_len = WINNOW_W + WINNOW_K - 1  # minimal guaranteed-match length
    shared = " ".join(f"m{i}" for i in range(run_len))
    rows = [
        (1, f"aa bb cc {shared} dd"),
        (2, f"xx {shared} yy zz qq"),
        (3, "totally different words with no common run at all here ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    # route the operator at the synthetic frame via the loader seam
    orig = tables.load_table
    try:
        tables.load_table = lambda s, sf, name: docs
        import csv_parquet_s3_spark.operators.textstats as ts

        orig_ts = ts.load_table
        ts.load_table = tables.load_table
        try:
            fp = text_winnowing_fingerprints(spark, "ignored").collect()
        finally:
            ts.load_table = orig_ts
    finally:
        tables.load_table = orig

    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
