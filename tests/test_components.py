"""Connected components vs an independent Python union-find model."""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.components import (
    connected_components,
    dedup_cluster_components,
)

SF = "/root/testdata/sf0.001"


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_components_match_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21), (3, 10), (30, 31)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {
        r.vertex: r.component
        for r in connected_components(df, "a", "b").collect()
    }
    assert got == _union_find(edges)


def test_chain_deeper_than_one_round(spark):
    # a 9-vertex path: min label must travel the full diameter
    edges = [(i, i + 1) for i in range(1, 9)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    comps = connected_components(df, "a", "b")
    assert {r.component for r in comps.collect()} == {1}


def test_dedup_clusters_on_real_pairs(spark):
    from csv_parquet_s3_spark.operators.dedup import dedup_minhash_lsh_pairs

    pairs = [
        (r.doc_id_a, r.doc_id_b)
        for r in dedup_minhash_lsh_pairs(spark, SF).collect()
    ]
    model = _union_find(pairs)
    out = dedup_cluster_components(spark, SF)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == model
    # cluster sizes consistent and keep-one-per-cluster selects exactly
    # one survivor per component
    survivors = out.filter(F.col("doc_id") == F.col("cluster_id")).count()
    assert survivors == len(set(model.values()))


def test_canonical_docs_survivorship(spark):
    """Every doc maps into its own cluster; the canonical member is the
    longest (tie: lowest doc_id); exactly one canonical per cluster."""
    from csv_parquet_s3_spark.operators.components import (
        dedup_canonical_docs,
        dedup_cluster_components,
    )
    from csv_parquet_s3_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = dedup_canonical_docs(spark, sf).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf, "documents").select("doc_id", "n_chars").collect()
    }
    comp = {r.doc_id: r.cluster_id for r in dedup_cluster_components(spark, sf).collect()}

    assert {r.doc_id for r in out} == set(docs)
    by_cluster: dict = {}
    for r in out:
        assert r.cluster_id == comp.get(r.doc_id, r.doc_id)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cluster, members in by_cluster.items():
        canonical = [r for r in members if r.is_canonical]
        assert len(canonical) == 1
        best = max(members, key=lambda r: (docs[r.doc_id], -r.doc_id))
        assert canonical[0].doc_id == best.doc_id
        assert all(r.canonical_id == best.doc_id for r in members)
