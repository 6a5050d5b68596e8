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

Not SQL-expressible in one statement → registered rows-only (the driver's
weaker check); the test suite verifies against a Python union-find model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.dedup import dedup_minhash_lsh_pairs
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


@register("dedup_cluster_components")  # iterative → rows-only check
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
