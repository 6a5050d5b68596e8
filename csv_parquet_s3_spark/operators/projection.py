"""Deterministic random projection (Johnson–Lindenstrauss) over the
embedding corpus: 64-d float vectors → 16-d sketches via a Rademacher (±1)
projection matrix derived from md5 — no RNG, no stored matrix artifact.

The projection matrix entry sign(i, j) is a pure function of the string
``p{i}_{j}``, so every engine (and every re-run, shard, or append) derives
the SAME matrix; the projected sketch is hash-checkable and stable. Distance
preservation (the JL property) is pinned statistically in
``tests/test_projection.py``.

Scale shape: the matrix is (in_dim × out_dim) rows — constant-size →
broadcast. The corpus side explodes each vector once and aggregates by
(vec_id, out_dim) with exact DECIMAL accumulation (order-independent sums).
At 100 TB this is one narrow shuffle keyed by vec_id; the usual deployment
projects once and feeds the 4× smaller sketches to the ANN index
(`similarity_index`) for cheaper coarse search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

PROJ_IN = 64   # embedding dim of the corpus
PROJ_OUT = 16  # sketch dim; scale factor 1/sqrt(PROJ_OUT)

# ±1 from the parity of the md5's last hex char — identical text modulo each
# engine's md5 argument type (Spark wants BINARY, DuckDB VARCHAR).
_SIGN_SPARK = (
    "CASE WHEN ascii(substring(md5(cast(concat('p', cast(i as string), '_',"
    " cast(j as string)) as binary)), 32, 1)) % 2 = 0 THEN 1 ELSE -1 END"
)
_SIGN_DUCK = (
    "CASE WHEN ascii(substr(md5('p' || i || '_' || j), 32, 1)) % 2 = 0"
    " THEN 1 ELSE -1 END"
)


def projection_matrix(spark: SparkSession) -> DataFrame:
    """(i, j, sign): the deterministic Rademacher matrix, 1-based input dim
    i, 0-based output dim j. Constant-size (PROJ_IN·PROJ_OUT rows)."""
    return (
        spark.range(1)
        .select(F.explode(F.expr(f"sequence(1, {PROJ_IN})")).alias("i"))
        .select("i", F.explode(F.expr(f"sequence(0, {PROJ_OUT - 1})")).alias("j"))
        .withColumn("sign", F.expr(_SIGN_SPARK))
    )


def project(emb: DataFrame, matrix: DataFrame) -> DataFrame:
    """(vec_id, dim, value): the projected sketch in long form. Components
    are summed as DECIMAL(20,9) of 9-digit-rounded terms — exact and
    order-independent, so the oracle reproduces every value bit-for-bit."""
    x = emb.select(
        "vec_id",
        F.posexplode(F.expr("transform(embedding, v -> CAST(v AS DOUBLE))")).alias(
            "pos", "xv"
        ),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.round("xv", 9).cast("decimal(20,9)").alias("xv"),
    )
    return (
        x.join(F.broadcast(matrix), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("xv") * F.col("sign")).alias("s"))
        .select(
            "vec_id",
            F.col("j").cast("int").alias("dim"),
            F.round(F.col("s").cast("double") / (PROJ_OUT ** 0.5), 6)
            .cast("double")
            .alias("value"),
        )
    )


@register(
    "emb_random_projection",
    oracle=f"""
    WITH r AS (
        SELECT i.i, j.j, {_SIGN_DUCK} AS sign
        FROM UNNEST(range(1, {PROJ_IN + 1})) AS i(i),
             UNNEST(range(0, {PROJ_OUT})) AS j(j)
    ),
    x AS (
        SELECT vec_id, CAST(u.i AS BIGINT) AS i,
               CAST(ROUND(CAST(embedding[u.i] AS DOUBLE), 9)
                    AS DECIMAL(20, 9)) AS xv
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    )
    SELECT x.vec_id, CAST(r.j AS INT) AS dim,
           CAST(ROUND(CAST(SUM(x.xv * r.sign) AS DOUBLE)
                / sqrt({PROJ_OUT}), 6) AS DOUBLE) AS value
    FROM x JOIN r ON r.i = x.i
    GROUP BY x.vec_id, r.j
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return project(emb, projection_matrix(spark))
