"""Similarity search over the ``embeddings`` table (``array<float>``, dim 64).

Two strategies, both pure built-in expressions (JVM-side, no Python UDF):

- brute-force cosine top-k: broadcast the (small) query set, score every
  (query, vector) pair with ``zip_with``/``aggregate``, keep top-k per query
  with a window. At 100 TB the scored side stays partition-parallel — the
  only shuffle is the final per-query top-k, bounded by k × |queries|.
- IVF-style partition-pruned top-k: restrict each search to the query's
  coarse cluster (the ``label`` column stands in for a trained IVF coarse
  quantizer), cutting the scored volume by the cluster fan-out.

All element arithmetic is cast to DOUBLE first and summed in array order, so
the DuckDB oracle (``list_transform``/``list_sum`` — also sequential) computes
bit-identical dot products; cosines are rounded to 6 digits and the ordering
key is the *rounded* value with vec_id tie-break, keeping top-k deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table
from csv_parquet_s3_spark.plans.materialize import materialize

N_QUERIES = 5  # vec_id < 5 are the "query" vectors
TOP_K = 10


def _with_norm(df: DataFrame) -> DataFrame:
    """Add a precomputed L2 norm column (sequential double accumulation)."""
    vd = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    norm = F.sqrt(
        F.aggregate(
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return df.withColumn("vd", vd).withColumn("norm", norm)


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


# Shared DuckDB fragments: sequential double dot product + norm over a FLOAT[].
_ORACLE_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_ORACLE_NORM = (
    "sqrt(list_sum(list_transform(range(1, len({v}) + 1),"
    " i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE))))"
)


@register(
    "sim_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv,
               {_ORACLE_NORM.format(v='embedding')} AS qnorm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id, e.label,
               CAST(ROUND({_ORACLE_DOT.format(a='q.qv', b='e.embedding')}
                    / (q.qnorm * {_ORACLE_NORM.format(v='e.embedding')}), 6) AS DOUBLE)
                 AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, label, cos_sim, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) t WHERE rn <= {TOP_K}
    """,
)
def sim_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × all vectors → window top-k."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vd").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(_dot(F.col("qv"), F.col("vd")) / (F.col("qnorm") * F.col("norm")), 6)
            .cast("double")
            .alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= TOP_K
    )


@register(
    "sim_cosine_topk_ivf_label",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel, embedding AS qv,
               {_ORACLE_NORM.format(v='embedding')} AS qnorm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               CAST(ROUND({_ORACLE_DOT.format(a='q.qv', b='e.embedding')}
                    / (q.qnorm * {_ORACLE_NORM.format(v='e.embedding')}), 6) AS DOUBLE)
                 AS cos_sim
        FROM q JOIN embeddings e ON e.label = q.qlabel
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) t WHERE rn <= {TOP_K}
    """,
)
def sim_cosine_topk_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style pruned search: only score vectors in the query's cluster.

    With an n-way coarse quantizer this scores ~1/n of the corpus per query —
    the scale path when brute force stops being affordable.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("vd").alias("qv"),
            F.col("norm").alias("qnorm"),
        )
    )
    scored = (
        emb.join(F.broadcast(q), emb.label == q.qlabel)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("vd")) / (F.col("qnorm") * F.col("norm")), 6)
            .cast("double")
            .alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= TOP_K
    )


K_LISTS = 8  # IVF coarse lists (seed centroids = vec_id N_QUERIES..N_QUERIES+7)
N_PROBE = 3  # lists probed per query


@register(
    "sim_cosine_topk_ivf_probe",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id - {N_QUERIES} AS list_id, embedding AS cv,
               {_ORACLE_NORM.format(v='embedding')} AS cnorm
        FROM embeddings
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + K_LISTS}
    ),
    assign AS (
        SELECT vec_id, label, embedding, norm, list_id FROM (
            SELECT e.vec_id, e.label, e.embedding, list_id,
                   {_ORACLE_NORM.format(v='e.embedding')} AS norm,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY CAST(ROUND({_ORACLE_DOT.format(a='e.embedding', b='c.cv')}
                                / ({_ORACLE_NORM.format(v='e.embedding')} * c.cnorm), 6)
                                AS DOUBLE) DESC, list_id) AS rn
            FROM embeddings e, cent c
        ) t WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, list_id FROM (
            SELECT q.vec_id AS query_id, c.list_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY CAST(ROUND({_ORACLE_DOT.format(a='q.embedding', b='c.cv')}
                                / ({_ORACLE_NORM.format(v='q.embedding')} * c.cnorm), 6)
                                AS DOUBLE) DESC, list_id) AS rn
            FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
        ) t WHERE rn <= {N_PROBE}
    ),
    scored AS (
        SELECT p.query_id, a.vec_id, a.list_id,
               CAST(ROUND({_ORACLE_DOT.format(a='q.embedding', b='a.embedding')}
                    / ({_ORACLE_NORM.format(v='q.embedding')} * a.norm), 6) AS DOUBLE)
                 AS cos_sim
        FROM probes p
        JOIN assign a ON a.list_id = p.list_id
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, list_id, cos_sim, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) t WHERE rn <= {TOP_K}
    """,
)
def sim_cosine_topk_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True IVF ANN: seed centroids → nearest-centroid inverted lists →
    nprobe-pruned top-k.

    The coarse quantizer is K deterministic seed vectors (a k-means init —
    portable so the oracle can replay it; a trained quantizer slots in
    without changing the dataflow). Index build = one broadcast cross join
    (corpus × K centroids, map-side) + one argmin; search scores only the
    NPROBE/K fraction of the corpus whose lists the query probes. At 100 TB
    the inverted lists are the partition key — each query's work is bounded
    by its probed lists, never the full corpus.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    # localCheckpoint: the K-row centroid frame is broadcast into BOTH the
    # corpus assignment and the query probe — un-checkpointed, each
    # broadcast replays the centroid extraction scan.
    cent = (
        emb.filter(
            (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + K_LISTS)
        )
        .select(
            (F.col("vec_id") - N_QUERIES).alias("list_id"),
            F.col("vd").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
        .transform(materialize)
    )
    cent_sim = F.round(
        _dot(F.col("vd"), F.col("cv")) / (F.col("norm") * F.col("cnorm")), 6
    ).cast("double")
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("list_id"))
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("csim", cent_sim)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "vd", "norm", "list_id")
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .withColumn("csim", cent_sim)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= N_PROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vd").alias("qv"),
            F.col("norm").alias("qnorm"),
            "list_id",
        )
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
        F.col("rn") <= TOP_K
    )


@register(
    "sim_label_centroid_distance",
    oracle="""
    WITH elems AS (
        SELECT label, vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
    ),
    centroids AS (
        SELECT label, dim,
               CAST(SUM(x) AS DOUBLE) / COUNT(*) AS c
        FROM elems GROUP BY label, dim
    )
    SELECT e.label,
           CAST(ROUND(SQRT(SUM((e.x - c.c) * (e.x - c.c))) , 4) AS DOUBLE) AS rms_spread,
           COUNT(DISTINCT e.vec_id) AS n_vectors
    FROM elems e JOIN centroids c ON e.label = c.label AND e.dim = c.dim
    GROUP BY e.label
    """,
)
def sim_label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster centroid + spread — the IVF "train" step's inner loop.

    posexplode → per-(label, dim) mean is the distributed centroid update:
    one shuffle keyed by (label, dim), no driver-side vectors.

    NOTE: the sum over (x - c)² aggregates doubles in engine order, so this
    is rounded to 4 digits (spread is O(100)) — see registry determinism rules.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "label",
        "vec_id",
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "dim", "x"
        ),
    )
    centroids = elems.groupBy("label", "dim").agg(
        (F.sum("x").cast("double") / F.count("*")).alias("c")
    )
    return (
        elems.join(centroids, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))), 4)
            .cast("double")
            .alias("rms_spread"),
            F.countDistinct("vec_id").alias("n_vectors"),
        )
    )


@register(
    "sim_cosine_topk_vectorized",
    # Same oracle as bruteforce minus the label column: the vectorized
    # scorer is pinned equal to the bruteforce operator (test suite, same
    # SFs the driver uses), and bruteforce hash-matches this SQL; the
    # half-away rounding emulation in the scorer keeps tie-breaks aligned.
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv,
               {_ORACLE_NORM.format(v='embedding')} AS qnorm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               CAST(ROUND({_ORACLE_DOT.format(a='q.qv', b='e.embedding')}
                    / (q.qnorm * {_ORACLE_NORM.format(v='e.embedding')}), 6) AS DOUBLE)
                 AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) t WHERE rn <= {TOP_K}
    """,
)
def sim_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized brute-force top-k: one numpy matmul per Arrow batch.

    Same semantics as :func:`sim_cosine_topk_bruteforce` (the test pins the
    outputs equal); different physical strategy. The per-element
    ``zip_with``/``aggregate`` dot product evaluates lambdas per array slot —
    at billions of vectors the BLAS matmul inside a ``mapInPandas`` batch
    wins by orders of magnitude. Each partition emits only its local top-k
    per query, so the final shuffle is k·|queries|·|partitions| rows, not
    the scored corpus. The query matrix is bounded (|queries|×dim) — driver
    state on par with a broadcast dim table.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    qm = np.array([r.embedding for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    top_k = TOP_K

    def score_batches(batches):
        import numpy as np
        import pandas as pd

        def round_half_away(x, k=6):
            # numpy's round is half-even; Spark's ROUND is half-away-from-
            # zero (BigDecimal HALF_UP). Emulate the latter so this stays
            # bit-equal to the bruteforce twin even at exact .5 ties.
            s = 10.0**k
            return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s

        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qm.T  # (batch, n_queries)
            out = {"query_id": [], "vec_id": [], "cos_sim": []}
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                order = cand_idx[
                    np.lexsort((ids[cand_idx], -round_half_away(col[cand_idx])))
                ][:top_k]
                out["query_id"].extend([qid] * len(order))
                out["vec_id"].extend(ids[order])
                out["cos_sim"].extend(round_half_away(col[order]))
            yield pd.DataFrame(out)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score_batches,
        schema="query_id bigint, vec_id bigint, cos_sim double",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= TOP_K
    )


@register(
    "emb_vector_qa_stats",
    oracle=f"""
    WITH norms AS (
        SELECT vec_id, label,
               CAST(ROUND({_ORACLE_NORM.format(v='embedding')}, 6)
                    AS DECIMAL(20,6)) AS norm6
        FROM embeddings
    ),
    stats AS (
        SELECT label, COUNT(*) AS n,
               CAST(ROUND(CAST(SUM(norm6) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
                   AS mean_norm,
               CAST(ROUND(sqrt(GREATEST(
                   CAST(SUM(norm6 * norm6) AS DOUBLE) / COUNT(*)
                   - (CAST(SUM(norm6) AS DOUBLE) / COUNT(*))
                     * (CAST(SUM(norm6) AS DOUBLE) / COUNT(*)), 0.0)), 6)
                    AS DOUBLE) AS std_norm
        FROM norms GROUP BY label
    )
    SELECT s.label, CAST(s.n AS BIGINT) AS n_vecs, s.mean_norm, s.std_norm,
           COUNT(*) FILTER (ABS(CAST(x.norm6 AS DOUBLE) - s.mean_norm)
                            > 2 * s.std_norm) AS n_outliers
    FROM stats s JOIN norms x ON x.label = s.label
    GROUP BY s.label, s.n, s.mean_norm, s.std_norm
    """,
)
def emb_vector_qa_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: per-label L2-norm distribution (mean, std from exact
    DECIMAL moments of the 6-digit-rounded norms) plus a 2σ outlier count —
    the sanity scan an embedding pipeline runs after every model or
    pre-processing change (degenerate near-zero vectors, un-normalized
    batches, and NaN-contaminated shards all surface as norm outliers).

    Two passes over a map-side norm column: one hash aggregate for the
    per-label moments (label-sized result, broadcasts back), one join +
    count for the outlier flags. Mean/std are rounded BEFORE the 2σ
    comparison, so the cut threshold is the identical double on both
    engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _with_norm(emb).select(
        "vec_id", "label", F.round("norm", 6).cast("decimal(20,6)").alias("norm6")
    )
    n = F.count("*")
    s1 = F.expr("CAST(SUM(norm6) AS DOUBLE)")
    s2 = F.expr("CAST(SUM(norm6 * norm6) AS DOUBLE)")
    mean6 = F.round(s1 / n, 6)
    std6 = F.round(F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))), 6)
    stats = norms.groupBy("label").agg(
        n.alias("n"),
        mean6.cast("double").alias("mean_norm"),
        std6.cast("double").alias("std_norm"),
    )
    is_outlier = (
        F.abs(F.col("norm6").cast("double") - F.col("mean_norm"))
        > 2 * F.col("std_norm")
    )
    return (
        norms.join(F.broadcast(stats), "label")
        .groupBy("label", "n", "mean_norm", "std_norm")
        .agg(F.sum(F.when(is_outlier, 1).otherwise(0)).alias("n_outliers"))
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vecs"),
            "mean_norm",
            "std_norm",
            "n_outliers",
        )
    )


@register(
    "emb_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel, embedding AS qv,
               {_ORACLE_NORM.format(v='embedding')} AS qnorm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id, e.label,
               CAST(ROUND({_ORACLE_DOT.format(a='q.qv', b='e.embedding')}
                    / (q.qnorm * {_ORACLE_NORM.format(v='e.embedding')}), 6) AS DOUBLE)
                 AS cos_sim
        FROM q, embeddings e
        WHERE e.label <> q.qlabel
    )
    SELECT query_id, vec_id, label, cos_sim, CAST(rn AS INT) AS rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    ) t WHERE rn <= {TOP_K}
    """,
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-{TOP_K} most-similar vectors whose LABEL DIFFERS — the
    highest-cosine wrong-class candidates are exactly the negatives that
    move a contrastive loss. Same broadcast-scored shape as the brute-force
    top-k (anchors broadcast, corpus scored map-side, per-anchor window);
    production swaps the scored side for the IVF index probe
    (`topk_from_index`) and keeps the label-mismatch filter.
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vd").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(
                _dot(F.col("qv"), F.col("vd")) / (F.col("qnorm") * F.col("norm")), 6
            )
            .cast("double")
            .alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.select(
        "*", F.row_number().over(w).cast("int").alias("rn")
    ).filter(F.col("rn") <= TOP_K)


@register(
    "sim_eval_recall_ivf_probe",
    oracle=f"""
    WITH bq AS (
        SELECT vec_id AS query_id, embedding AS qv,
               {_ORACLE_NORM.format(v='embedding')} AS qnorm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    bscored AS (
        SELECT bq.query_id, e.vec_id,
               CAST(ROUND({_ORACLE_DOT.format(a='bq.qv', b='e.embedding')}
                    / (bq.qnorm * {_ORACLE_NORM.format(v='e.embedding')}), 6)
                    AS DOUBLE) AS cos_sim
        FROM bq, embeddings e WHERE e.vec_id <> bq.query_id
    ),
    btop AS (
        SELECT query_id, vec_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id) AS rn
            FROM bscored
        ) t WHERE rn <= {TOP_K}
    ),
    cent AS (
        SELECT vec_id - {N_QUERIES} AS list_id, embedding AS cv,
               {_ORACLE_NORM.format(v='embedding')} AS cnorm
        FROM embeddings
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + K_LISTS}
    ),
    assign AS (
        SELECT vec_id, embedding, norm, list_id FROM (
            SELECT e.vec_id, e.embedding, list_id,
                   {_ORACLE_NORM.format(v='e.embedding')} AS norm,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY CAST(ROUND({_ORACLE_DOT.format(a='e.embedding', b='c.cv')}
                                / ({_ORACLE_NORM.format(v='e.embedding')} * c.cnorm), 6)
                                AS DOUBLE) DESC, list_id) AS rn
            FROM embeddings e, cent c
        ) t WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, list_id FROM (
            SELECT q.vec_id AS query_id, c.list_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY CAST(ROUND({_ORACLE_DOT.format(a='q.embedding', b='c.cv')}
                                / ({_ORACLE_NORM.format(v='q.embedding')} * c.cnorm), 6)
                                AS DOUBLE) DESC, list_id) AS rn
            FROM embeddings q, cent c WHERE q.vec_id < {N_QUERIES}
        ) t WHERE rn <= {N_PROBE}
    ),
    iscored AS (
        SELECT p.query_id, a.vec_id,
               CAST(ROUND({_ORACLE_DOT.format(a='q.embedding', b='a.embedding')}
                    / ({_ORACLE_NORM.format(v='q.embedding')} * a.norm), 6) AS DOUBLE)
                 AS cos_sim
        FROM probes p
        JOIN assign a ON a.list_id = p.list_id
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
    ),
    itop AS (
        SELECT query_id, vec_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id) AS rn
            FROM iscored
        ) t WHERE rn <= {TOP_K}
    ),
    hits AS (
        SELECT b.query_id, COUNT(*) AS n_hits
        FROM btop b JOIN itop i
          ON i.query_id = b.query_id AND i.vec_id = b.vec_id
        GROUP BY b.query_id
    )
    SELECT q.query_id, {TOP_K} AS k,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall
    FROM (SELECT DISTINCT query_id FROM btop) q
    LEFT JOIN hits h ON h.query_id = q.query_id
    """,
)
def sim_eval_recall_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the nprobe-pruned IVF search against exact brute force —
    ANN EVALUATION as a registered, hash-checked query: the number every
    index deployment watches, computed by composing the two searches
    unchanged and intersecting their top-k sets (a |Q|·k join). Driver-
    checkable because both searches are deterministic; at 100 TB the exact
    side runs on a sampled query set, which is exactly this shape. Both
    top-k sets are localCheckpointed (|Q|·k rows): the exact side feeds the
    hit join AND the query spine, and un-checkpointed each reference
    replays the whole corpus search."""
    exact = (
        sim_cosine_topk_bruteforce(spark, sf_dir)
        .select("query_id", "vec_id")
        .transform(materialize)
    )
    approx = (
        sim_cosine_topk_ivf_probe(spark, sf_dir)
        .select("query_id", "vec_id")
        .transform(materialize)
    )
    hits = (
        exact.join(approx, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(TOP_K).alias("k"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K).alias("recall"),
        )
    )
