"""Dataset splitting and sampling for training pipelines.

- Deterministic hash split: route each document to train/valid/test by a
  content-stable hash of its key. The split is a pure function of the row —
  reproducible across runs, engines, and cluster sizes, and new data lands
  in the same split forever (no reshuffling on append). This is the only
  split discipline that survives a 100 TB incremental pipeline; random
  splits are not stable under retries/appends.
- Stratified sampling: per-stratum Bernoulli sampling (``sampleBy``) to
  rebalance skewed corpora (e.g., cap the dominant language). Sampling RNG
  is engine-specific → rows-only driver check; the test suite checks the
  realized per-stratum rates statistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

TRAIN_PCT = 80
VALID_PCT = 10  # test = remainder


def _bucket_expr(md5_expr: str) -> str:
    """0-99 bucket from the first 4 hex chars of an md5 — hex→int via
    ``ascii()`` so the identical arithmetic runs on any engine (DuckDB has
    no hex-string→integer cast)."""
    terms = " + ".join(
        f"ascii(substring({md5_expr}, {i + 1}, 1)) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"({terms}) % 100"


def hash_split(df: DataFrame, key: str) -> DataFrame:
    """Add a stable ``split`` column derived from md5(key) — portable to any
    engine (the oracle runs the same expression)."""
    md5 = f"md5(CAST(CAST({key} AS STRING) AS BINARY))"
    bucket = F.expr(_bucket_expr(md5))
    return df.withColumn(
        "split",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test"),
    )


@register(
    "split_documents_train_test",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM (
        SELECT doc_id,
               CASE WHEN b < {TRAIN_PCT} THEN 'train'
                    WHEN b < {TRAIN_PCT + VALID_PCT} THEN 'valid'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   {_bucket_expr("md5(CAST(doc_id AS VARCHAR))")} AS b
            FROM documents
        ) h
    ) s
    GROUP BY split
    """,
)
def split_documents_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split summary; hash bucket = first 3 bytes of
    md5(doc_id), identical arithmetic in Spark (conv base16) and DuckDB
    (from_hex)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register("sample_documents_stratified")  # engine-specific RNG → rows-only
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified downsample: keep ~30% of the dominant stratum and
    all of the rest (corpus rebalancing). Seeded Bernoulli per stratum —
    distributed, single pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    dominant = (
        docs.groupBy("lang").count().orderBy(F.desc("count"), "lang").first().lang
    )
    fractions = {lang: (0.3 if lang == dominant else 1.0) for lang in langs}
    return docs.sampleBy("lang", fractions, seed=42)
