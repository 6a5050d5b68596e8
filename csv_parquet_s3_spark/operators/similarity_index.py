"""Incremental IVF index: the materialized ANN index for a growing corpus.

Mirror of :mod:`minhash_index` for vectors. The index is two parquet
datasets under one root:

- ``centroids/`` — the coarse quantizer (list_id, centroid vector, norm);
  fixed at build time (retraining = rebuild, as in any IVF system);
- ``assign/``    — the inverted lists (vec_id, list_id, vector, norm),
  updated per ingest batch by assigning ONLY the new vectors against the
  stored centroids and MERGE-ing (`maintenance.upsert`).

Search probes the top-``nprobe`` lists per query against ``assign/`` —
cost per query tracks nprobe/K of the corpus, and index maintenance cost
tracks the batch, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.maintenance import upsert
from csv_parquet_s3_spark.operators.similarity import TOP_K, _dot, _with_norm


def _centroid_frame(cent: DataFrame) -> DataFrame:
    return cent.select(
        "list_id", F.col("vd").alias("cv"), F.col("norm").alias("cnorm")
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (rounded cosine, list_id tie-break)."""
    sim = F.round(
        _dot(F.col("vd"), F.col("cv")) / (F.col("norm") * F.col("cnorm")), 6
    ).cast("double")
    w = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("list_id"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("csim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vd", "norm", "list_id")
    )


def build_ivf_index(
    spark: SparkSession,
    vectors: DataFrame,
    centroid_vec_ids: list[int],
    index_path: str,
    train_iters: int = 0,
) -> None:
    """Full build: quantizer from the given seed vectors + inverted lists
    for every vector. ``train_iters > 0`` refines the seeds with that many
    spherical-k-means Lloyd iterations (:func:`train_centroids`) before the
    lists are built — tighter lists, better nprobe recall, same dataflow."""
    emb = _with_norm(vectors)
    if train_iters > 0:
        cent = train_centroids(spark, vectors, centroid_vec_ids, iters=train_iters)
    else:
        cent = _centroid_frame(
            emb.filter(F.col("vec_id").isin(centroid_vec_ids)).select(
                F.dense_rank()
                .over(W.orderBy("vec_id"))
                .cast("bigint")
                .alias("list_id"),
                "vd",
                "norm",
            )
        )
    cent.write.mode("overwrite").parquet(f"{index_path}/centroids")
    assign = _assign(emb.select("vec_id", "vd", "norm"), spark.read.parquet(f"{index_path}/centroids"))
    assign.write.mode("overwrite").parquet(f"{index_path}/assign")


def update_ivf_index(spark: SparkSession, new_vectors: DataFrame, index_path: str) -> tuple[int, int]:
    """Incremental: assign the new batch against the STORED quantizer and
    merge by vec_id (re-ingested vectors get reassigned). Returns
    (n_updated, n_inserted)."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    assign = _assign(_with_norm(new_vectors).select("vec_id", "vd", "norm"), cent)
    return upsert(spark, f"{index_path}/assign", assign, key="vec_id")


def topk_from_index(
    spark: SparkSession, queries: DataFrame, index_path: str, nprobe: int, k: int = TOP_K
) -> DataFrame:
    """nprobe-pruned cosine top-k for each query vector, from the stored
    index only."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    assign = spark.read.parquet(f"{index_path}/assign")
    q = _with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vd").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    qsim = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6
    ).cast("double")
    wq = W.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("list_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("qsim", qsim)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qnorm", "list_id")
    )
    scored = (
        assign.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "list_id",
            F.round(_dot(F.col("qv"), F.col("vd")) / (F.col("qnorm") * F.col("norm")), 6)
            .cast("double")
            .alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= k
    )


def _centroid_update(members: DataFrame) -> DataFrame:
    """One Lloyd update: per-list mean vector (posexplode → per-(list, dim)
    mean → re-assemble array), spherical (unit-norm) for cosine."""
    elems = members.select(
        "list_id", F.posexplode(F.col("vd")).alias("dim", "x")
    )
    cent_elems = elems.groupBy("list_id", "dim").agg(F.avg("x").alias("c"))
    assembled = cent_elems.groupBy("list_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, c))), s -> s.c)"
        ).alias("cv_raw")
    )
    return assembled.select(
        "list_id",
        F.expr("transform(cv_raw, x -> x / sqrt(aggregate(transform(cv_raw, y -> y * y), CAST(0.0 AS DOUBLE), (a, y) -> a + y)))").alias("cv"),
    ).withColumn(
        "cnorm", F.lit(1.0)
    )


def train_centroids(
    spark: SparkSession, vectors: DataFrame, seed_vec_ids: list[int], iters: int = 3
) -> DataFrame:
    """Spherical k-means (Lloyd) from deterministic seeds, pure dataframe
    ops: assign (broadcast centroids, map-side) → per-list mean → repeat.
    Each iteration is one job; ``localCheckpoint`` truncates lineage. A list
    that loses every member keeps its previous centroid (coalesce)."""
    emb = _with_norm(vectors)
    cent = _centroid_frame(
        emb.filter(F.col("vec_id").isin(seed_vec_ids)).select(
            F.dense_rank().over(W.orderBy("vec_id")).cast("bigint").alias("list_id"),
            "vd",
            "norm",
        )
    ).localCheckpoint(eager=True)
    pts = emb.select("vec_id", "vd", "norm")
    for _ in range(iters):
        members = _assign(pts, cent)
        updated = _centroid_update(members)
        cent = (
            cent.alias("o")
            .join(updated.alias("u"), "list_id", "left")
            .select(
                "list_id",
                F.coalesce("u.cv", "o.cv").alias("cv"),
                F.coalesce("u.cnorm", "o.cnorm").alias("cnorm"),
            )
            .localCheckpoint(eager=True)
        )
    return cent


def quantization_error(vectors: DataFrame, centroids: DataFrame) -> float:
    """Mean (1 - cosine) of each vector to its assigned centroid — the
    k-means objective for spherical clustering (driver sees one float)."""
    emb = _with_norm(vectors).select("vec_id", "vd", "norm")
    sim = F.round(
        _dot(F.col("vd"), F.col("cv")) / (F.col("norm") * F.col("cnorm")), 9
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("list_id"))
    best = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("csim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    row = best.agg(F.avg(F.lit(1.0) - F.col("csim")).alias("err")).collect()[0]
    return float(row.err)
