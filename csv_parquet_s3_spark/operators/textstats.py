"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID heuristics, fingerprinting, corpus statistics.

All operators are single-pass array/string expressions (whole-stage codegen,
no Python) — per-document features never shuffle, and corpus-level rollups
shuffle only their small grouping keys. That shape is what keeps these
linear-scan cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "text_token_counts",
    oracle="""
    SELECT t AS token, COUNT(*) AS n
    FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
    GROUP BY t
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency, top 20 — explode + count + top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_doc_stats",
    oracle="""
    WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
           CAST(ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                      / len(toks), 6) AS DOUBLE) AS avg_token_len,
           CAST(ROUND(LN(1 + n_chars)
                      * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)), 6)
                AS DOUBLE) AS quality_score
    FROM t
    """,
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token counts, type/token ratio score."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", "n_chars", F.split("text", " ").alias("toks"))
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    sum_len = F.aggregate(
        F.expr("transform(toks, x -> length(x))"), F.lit(0), lambda a, x: a + x
    )
    return t.select(
        "doc_id",
        "lang",
        n_tokens.cast("int").alias("n_tokens"),
        n_distinct.cast("int").alias("n_distinct_tokens"),
        F.round(sum_len.cast("double") / n_tokens, 6)
        .cast("double")
        .alias("avg_token_len"),
        F.round(
            F.log(F.lit(1) + F.col("n_chars")) * (n_distinct.cast("double") / n_tokens), 6
        )
        .cast("double")
        .alias("quality_score"),
    )


@register(
    "text_langid_heuristic",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, lang,
           CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS INT) AS stop_hits,
           CASE WHEN CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                     / len(toks) >= 0.05
                THEN 'en' ELSE 'unk' END AS predicted_lang
    FROM t
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic (n-gram-free baseline)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    hits = F.size(F.expr(f"filter(toks, x -> x IN ({stop_arr}))"))
    return t.select(
        "doc_id",
        "lang",
        hits.cast("int").alias("stop_hits"),
        F.when(hits.cast("double") / F.size("toks") >= 0.05, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_word_tokens
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (sorted-vocabulary hash) plus a
    regex tokenizer count (BPE-ish pre-tokenization proxy)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ").cast(
                "binary"
            )
        ).alias("fingerprint"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)"))
        .cast("int")
        .alias("n_word_tokens"),
    )


@register(
    "text_lang_distribution",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
             AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (lang, source)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6)
        .cast("double")
        .alias("avg_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


N_PROFILE = 20  # top trigrams kept per language profile


@register(
    "text_langid_ngram",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, lang, substr(lower(text), i, 3) AS g
        FROM documents, UNNEST(range(1, length(text) - 1)) AS r(i)
        WHERE length(text) >= 3
    ),
    doc_grams AS (SELECT DISTINCT doc_id, lang, g FROM grams),
    profile AS (
        SELECT lang AS plang, g FROM (
            SELECT lang, g, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY COUNT(*) DESC, g) AS rn
            FROM grams GROUP BY lang, g
        ) t WHERE rn <= {N_PROFILE}
    ),
    scores AS (
        SELECT d.doc_id, d.lang, p.plang, COUNT(*) AS overlap
        FROM doc_grams d JOIN profile p ON d.g = p.g
        GROUP BY d.doc_id, d.lang, p.plang
    )
    SELECT doc_id, lang, plang AS predicted_lang, overlap FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY overlap DESC, plang) AS rn
        FROM scores
    ) t WHERE rn = 1
    """,
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-ID: learn a top-N trigram profile per
    language from the corpus, classify each document by largest profile
    overlap (ties → lexicographic language).

    Two aggregations + one broadcast join: profiles are |langs|·N rows
    (constant-size → broadcast), so classification is map-side against the
    per-document distinct-trigram explode — linear in corpus size at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(lower(text), i, 3))"
            )
        ).alias("g"),
    )
    doc_grams = grams.distinct()
    w_prof = W.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("g"))
    profile = (
        grams.groupBy("lang", "g")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= N_PROFILE)
        .select(F.col("lang").alias("plang"), "g")
    )
    scores = (
        doc_grams.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count("*").alias("overlap"))
    )
    w_best = W.partitionBy("doc_id").orderBy(F.desc("overlap"), F.asc("plang"))
    return (
        scores.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("plang").alias("predicted_lang"), "overlap")
    )


HASH_DIM = 64  # feature-hashing vector width


@register(
    "text_feature_hash_embedding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        WHERE t <> ''
    ),
    hashed AS (
        SELECT doc_id,
               (ascii(substr(md5(token), 1, 1)) * 16
                + ascii(substr(md5(token), 2, 1))) % {HASH_DIM} AS dim,
               CASE WHEN ascii(substr(md5(token), 3, 1)) % 2 = 0
                    THEN 1 ELSE -1 END AS sign
        FROM toks
    )
    SELECT doc_id, dim, CAST(SUM(sign) AS BIGINT) AS weight
    FROM hashed GROUP BY doc_id, dim
    HAVING SUM(sign) <> 0
    """,
)
def text_feature_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text vectorizer (Weinberger et al., ICML'09): each token
    hashes to a dimension with a hashed ±1 sign; per-(doc, dim) weights are
    the sparse embedding in long form — the layout a feature store ingests,
    convertible to dense ``array<float>`` with one ``map_from_entries``.

    Hex→int again goes through ``ascii()`` so Spark and DuckDB compute the
    identical bucket. One explode + one aggregation keyed (doc_id, dim):
    linear in corpus tokens, 100 TB-safe.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    md5 = "md5(CAST(token AS BINARY))"
    dim = F.expr(
        f"(ascii(substring({md5}, 1, 1)) * 16"
        f" + ascii(substring({md5}, 2, 1))) % {HASH_DIM}"
    )
    sign = F.expr(
        f"CASE WHEN ascii(substring({md5}, 3, 1)) % 2 = 0 THEN 1 ELSE -1 END"
    )
    return (
        toks.select("doc_id", dim.alias("dim"), sign.alias("sign"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("weight"))
        .filter(F.col("weight") != 0)
    )


TFIDF_TOP = 3


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, t AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        WHERE t <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               CAST(ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                    AS DOUBLE) AS tfidf
        FROM tf JOIN df ON tf.token = df.token, n
    )
    SELECT doc_id, token, tfidf, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
        FROM scored
    ) t WHERE rank <= {TFIDF_TOP} AND tfidf > 0.0
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF top terms: term frequency × ln(N/df), top
    {TFIDF_TOP} per doc.

    Scale shape: tf is one aggregate keyed (doc, token); df is one keyed
    (token); the df table is vocabulary-sized → broadcast back onto tf, so
    scoring is map-side. The doc count is a one-row broadcast. The final
    per-doc window shuffles only the scored tf rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            )
            .cast("double")
            .alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= TFIDF_TOP) & (F.col("tfidf") > 0.0))
    )
