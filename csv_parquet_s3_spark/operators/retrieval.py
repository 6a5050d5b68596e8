"""Hybrid retrieval: lexical + vector rankers fused with reciprocal-rank
fusion (RRF, Cormack et al. SIGIR'09) over the paired ``documents`` /
``embeddings`` tables (doc_id == vec_id).

Reference scope: the reference engine (529 Java + 505 PL/SQL ETL lines) has
no retrieval surface; this is part of the driver-mandated training-data /
serving extensions, composed entirely from built-in DataFrame ops.

Scale shape: the query set is bounded (a handful of probe documents), so
query tokens and query vectors BROADCAST; candidate scoring is map-side
against each corpus partition and the only shuffles are the per-query
rankings (window on query_id — k×|queries| rows leave each executor after
partial top-k at the exchange). Exact RRF needs each candidate's rank in
BOTH rankers; the production trick at 100 TB is to truncate each ranker to
its top-N (N >> k) before fusing — noted below, not done here, because the
oracle pins the exact full-ranking semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.operators.similarity import (
    _ORACLE_DOT,
    _ORACLE_NORM,
    _dot,
    _with_norm,
)
from csv_parquet_s3_spark.sources.tables import load_table

N_QUERIES = 5   # doc_id < 5 are the probe queries (same convention as similarity)
RRF_K = 60      # standard RRF dampening constant
TOP_K = 10


@register(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH qdocs AS (
        SELECT doc_id AS query_id, string_split(text, ' ') AS qtoks
        FROM documents WHERE doc_id < {N_QUERIES}
    ),
    cands AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents
    ),
    lex AS (
        SELECT q.query_id, c.doc_id,
               len(list_intersect(list_distinct(c.toks), list_distinct(q.qtoks)))
                   AS overlap
        FROM qdocs q, cands c
        WHERE c.doc_id <> q.query_id
    ),
    lexrank AS (
        SELECT query_id, doc_id, overlap,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY overlap DESC, doc_id) AS lex_rank
        FROM lex
    ),
    qv AS (
        SELECT vec_id AS query_id, embedding AS qv,
               {_ORACLE_NORM.format(v='embedding')} AS qnorm
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    vec AS (
        SELECT q.query_id, e.vec_id AS doc_id,
               CAST(ROUND({_ORACLE_DOT.format(a='q.qv', b='e.embedding')}
                    / (q.qnorm * {_ORACLE_NORM.format(v='e.embedding')}), 6)
                    AS DOUBLE) AS cos_sim
        FROM qv q, embeddings e
        WHERE e.vec_id <> q.query_id
    ),
    vecrank AS (
        SELECT query_id, doc_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, doc_id) AS vec_rank
        FROM vec
    ),
    fused AS (
        SELECT l.query_id, l.doc_id,
               CAST(l.lex_rank AS INT) AS lex_rank,
               CAST(v.vec_rank AS INT) AS vec_rank,
               CAST(ROUND(1.0 / ({RRF_K} + l.lex_rank)
                          + 1.0 / ({RRF_K} + v.vec_rank), 6) AS DOUBLE) AS rrf_score
        FROM lexrank l JOIN vecrank v
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, lex_rank, vec_rank, rrf_score, CAST(rn AS INT) AS rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rrf_score DESC, doc_id) AS rn
        FROM fused
    ) t WHERE rn <= {TOP_K}
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} documents per probe query by reciprocal-rank fusion of a
    lexical ranker (distinct-token overlap with the query document) and a
    vector ranker (embedding cosine): rrf = Σ 1/({RRF_K} + rank_i).

    Rank fusion is how production retrieval combines BM25-style and
    dense-vector candidates without score calibration — only RANKS cross
    the ranker boundary, so the two scoring scales never need reconciling.
    Both rankings are total (ties break on doc_id) and the fused score is
    the same double arithmetic on both engines, rounded before the final
    ordering, so the oracle pins the exact fusion.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # lexical leg: distinct-token overlap via broadcast of the query tokens
    qdocs = docs.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.array_distinct(F.split("text", " ")).alias("qtoks"),
    )
    cands = docs.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
    lex = (
        cands.crossJoin(F.broadcast(qdocs))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.size(F.array_intersect("toks", "qtoks")).alias("overlap"),
        )
    )
    wl = W.partitionBy("query_id").orderBy(F.desc("overlap"), F.asc("doc_id"))
    lexrank = lex.select("query_id", "doc_id", F.row_number().over(wl).alias("lex_rank"))

    # vector leg: same arithmetic as sim_cosine_topk_bruteforce
    embn = _with_norm(emb)
    qv = embn.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vd").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    vec = (
        embn.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot(F.col("qv"), F.col("vd")) / (F.col("qnorm") * F.col("norm")), 6
            )
            .cast("double")
            .alias("cos_sim"),
        )
    )
    wv = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    vecrank = vec.select("query_id", "doc_id", F.row_number().over(wv).alias("vec_rank"))

    fused = lexrank.join(vecrank, ["query_id", "doc_id"]).select(
        "query_id",
        "doc_id",
        F.col("lex_rank").cast("int").alias("lex_rank"),
        F.col("vec_rank").cast("int").alias("vec_rank"),
        F.round(
            1.0 / (RRF_K + F.col("lex_rank")) + 1.0 / (RRF_K + F.col("vec_rank")), 6
        )
        .cast("double")
        .alias("rrf_score"),
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.select("*", F.row_number().over(wf).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
    )


# ---------------------------------------------------------------------------
# BM25 — the lexical ranker production retrieval actually uses (Robertson &
# Zaragoza 2009). Same determinism discipline as text_unigram_perplexity:
# each per-term score is rounded to 6 digits and summed as DECIMAL(20,6),
# so the two engines' different reduce orders cannot diverge (the JVM's and
# DuckDB's libm LN differ in the last ulp — 6-digit rounding absorbs it).
# ---------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "retrieval_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        WHERE t <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    qterms AS (
        SELECT DISTINCT doc_id AS query_id, token FROM toks
        WHERE doc_id < {N_QUERIES}
    ),
    doc_tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    scored AS (
        SELECT q.query_id, t.doc_id,
               SUM(CAST(ROUND(
                   ROUND(LN(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)), 6)
                   * (t.tf * ({BM25_K1} + 1.0)
                      / (t.tf + {BM25_K1}
                         * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))),
                   6) AS DECIMAL(20,6))) AS score_sum
        FROM qterms q
        JOIN doc_tf t ON t.token = q.token AND t.doc_id <> q.query_id
        JOIN df f ON f.token = q.token
        JOIN dl d ON d.doc_id = t.doc_id, stats s
        GROUP BY q.query_id, t.doc_id
    )
    SELECT query_id, doc_id,
           CAST(score_sum AS DOUBLE) AS bm25, CAST(rn AS INT) AS rn
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score_sum DESC, doc_id) AS rn
        FROM scored
    ) t WHERE rn <= {TOP_K}
    """,
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} BM25(k1={BM25_K1}, b={BM25_B}) documents per probe query
    (query terms = the probe document's distinct tokens; the corpus itself
    is the collection).

    Scale shape: df/avgdl are vocabulary- and one-row-sized aggregates that
    broadcast; per-candidate scoring joins the bounded query-term set
    against per-doc term frequencies map-side, partial-aggregates the
    per-term contributions, and only (query, doc, score) rows shuffle for
    the final per-query top-k. The idf table doubles as the reusable index
    artifact — at 100 TB it is built once per corpus snapshot.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    # Every statistic chains off doc_tf (dl = Σtf per doc, df = row count
    # per token, stats from dl), and doc_tf is localCheckpointed: it is the
    # index artifact (built once per corpus snapshot at 100 TB), and four
    # consumers reference it (dl, df, qterms, the scoring join) — without
    # the checkpoint each replays the tokenize + partial aggregate (the r06
    # plan audit measured 5 scans / 11 exchanges). Everything SHUFFLED
    # beyond the first partial aggregate is distinct (doc, token) pairs,
    # not raw token occurrences.
    doc_tf = (
        toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).localCheckpoint()
    )
    dl = doc_tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.expr("CAST(SUM(dl) AS DOUBLE)") / F.count("*")).alias("avgdl"),
    )
    df = doc_tf.groupBy("token").agg(F.count("*").alias("df"))
    qterms = doc_tf.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    idf6 = F.round(
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)), 6
    )
    tf_w = (
        F.col("tf")
        * (BM25_K1 + 1.0)
        / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    )
    term_score = F.round(idf6 * tf_w, 6).cast("decimal(20,6)")
    scored = (
        doc_tf.join(F.broadcast(qterms), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(df, "token")  # vocabulary-sized: AQE broadcasts, never hinted
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(term_score).alias("score_sum"))
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("score_sum"), F.asc("doc_id"))
    return (
        scored.select("*", F.row_number().over(wq).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("score_sum").cast("double").alias("bm25"),
            "rn",
        )
    )
