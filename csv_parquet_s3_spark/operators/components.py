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


@register(
    "dedup_canonical_docs",
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
    all_docs AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    canon AS (
        SELECT cluster_id, doc_id AS canonical_id FROM (
            SELECT cluster_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY cluster_id
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM all_docs
        ) z WHERE rn = 1
    )
    SELECT a.doc_id, a.cluster_id, c.canonical_id,
           a.doc_id = c.canonical_id AS is_canonical
    FROM all_docs a JOIN canon c ON c.cluster_id = a.cluster_id
    """,
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: the keep-list a dedup pipeline actually ships. Every
    document maps to a canonical representative — within a near-dup cluster
    the LONGEST document wins (tie: lowest doc_id); singletons are their own
    canonical. Downstream keeps ``is_canonical`` rows and rewrites references
    through ``canonical_id``.

    Scale shape: clusters from min-label propagation (bounded by |edges|),
    survivor choice is one ``max_by`` aggregation keyed by cluster — no
    window over the corpus, no collect."""
    from csv_parquet_s3_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    comp = dedup_cluster_components(spark, sf_dir).select("doc_id", "cluster_id")
    all_docs = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    canon = all_docs.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg"))
        ).alias("canonical_id")
    )
    return all_docs.join(canon, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )
