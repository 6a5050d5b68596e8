"""Connected components over near-duplicate pairs: the cluster step of dedup.

Pair generation (MinHash LSH, embedding cosine, n-gram Jaccard — see
:mod:`dedup`, :mod:`neardup`) yields *edges*; choosing one survivor per
duplicate *group* needs the transitive closure: connected components. The
reference has nothing comparable (SURVEY.md §2.2 — no join, let alone an
iterative algorithm); this is a driver-mandated training-pipeline extension.

Algorithm: distributed min-label propagation (the dataframe form of
large-star/small-star — Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14). Each vertex repeatedly adopts the minimum label in
its neighborhood; fixpoint in O(diameter) rounds (near-dup clusters are
shallow — boilerplate families, not long chains).

Scale notes: each round is one join + one groupBy on vertex ids (shuffle
bounded by |edges|); ``localCheckpoint`` truncates the lineage so round k
doesn't replay rounds 1..k-1; the driver only sees the one-row convergence
count per round, never data.

The fixpoint IS SQL-expressible as a recursive-CTE transitive closure
(labels are exact integers — no FP drift), so the driver hash-checks this
against DuckDB replaying the same pair pipeline + closure; the test suite
additionally verifies against a Python union-find model. The closure oracle
is O(|component|²) rows per component — fine for an oracle at test SF, which
is exactly why the ENGINE side uses min-label propagation instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.dedup import (
    _ORACLE_BANDS,
    _ORACLE_PAIR_CTES,
    _ORACLE_SHINGLES,
    dedup_minhash_lsh_pairs,
)
from csv_parquet_s3_spark.operators.registry import register

MAX_ROUNDS = 20


def connected_components(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """(vertex, component) from an undirected edge list; component = min
    vertex id reachable. Fixpoint min-label propagation."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for _ in range(MAX_ROUNDS):
        # neighborhood minimum: min over own label and all neighbors' labels
        neighbor_min = (
            edges.join(labels, edges.v == labels.vertex)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.u, "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("nmin", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE {_ORACLE_SHINGLES},
    {_ORACLE_BANDS},
    {_ORACLE_PAIR_CTES},
    edges AS (
        SELECT doc_id_a AS u, doc_id_b AS v FROM lsh_pairs
        UNION
        SELECT doc_id_b AS u, doc_id_a AS v FROM lsh_pairs
    ),
    reach AS (
        SELECT u AS doc_id, u AS label FROM edges
        UNION
        SELECT e.u AS doc_id, r.label
        FROM edges e JOIN reach r ON r.doc_id = e.v
    ),
    comp AS (SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id),
    csizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT c.doc_id, c.cluster_id, s.cluster_size
    FROM comp c JOIN csizes s ON c.cluster_id = s.cluster_id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters from MinHash-LSH pairs: (doc_id, cluster_id,
    cluster_size), cluster_id = min doc_id in the component. Downstream
    "keep one per cluster" is then a filter ``doc_id == cluster_id``."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    comp = connected_components(pairs, "doc_id_a", "doc_id_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
        )
    )
