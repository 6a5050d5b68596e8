"""Dataset splitting and sampling for training pipelines.

- Deterministic hash split: route each document to train/valid/test by a
  content-stable hash of its key. The split is a pure function of the row —
  reproducible across runs, engines, and cluster sizes, and new data lands
  in the same split forever (no reshuffling on append). This is the only
  split discipline that survives a 100 TB incremental pipeline; random
  splits are not stable under retries/appends.
- Stratified sampling: per-stratum Bernoulli sampling to rebalance skewed
  corpora (e.g., cap the dominant language). The Bernoulli trial is a
  deterministic hash of the row key (not an engine RNG), so the sample is
  reproducible and oracle-checkable; the test suite additionally checks the
  realized per-stratum rates statistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import ORACLES, register
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


DOMINANT_KEEP_PCT = 30


@register(
    "sample_documents_stratified",
    oracle=f"""
    WITH dom AS (
        SELECT lang AS dominant_lang
        FROM documents GROUP BY lang
        ORDER BY COUNT(*) DESC, lang LIMIT 1
    )
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d, dom
    WHERE d.lang <> dom.dominant_lang
       OR {_bucket_expr("md5(CAST(doc_id AS VARCHAR))")} < {DOMINANT_KEEP_PCT}
    """,
)
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified downsample: keep ~30% of the dominant stratum and
    all of the rest (corpus rebalancing).

    The keep decision is a deterministic hash-Bernoulli on md5(doc_id) — the
    same content-stable discipline as :func:`hash_split` — so the sample is
    reproducible across runs/engines (hash-checked, not rows-only) and stable
    under appends. The dominant stratum is computed distributed and attached
    via a broadcast of a ONE-ROW aggregate: no driver-side collect, no
    stratum-cardinality assumption.
    """
    docs = load_table(spark, sf_dir, "documents")
    dom = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "lang")
        .limit(1)
        .select(F.col("lang").alias("dominant_lang"))
    )
    md5 = "md5(CAST(CAST(doc_id AS STRING) AS BINARY))"
    keep = (F.col("lang") != F.col("dominant_lang")) | (
        F.expr(_bucket_expr(md5)) < DOMINANT_KEEP_PCT
    )
    return (
        docs.crossJoin(F.broadcast(dom))
        .filter(keep)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# Quality-weighted sampling + corpus rebalancing — both with EXACT integer
# keep rules (hash·scale < weight·2^32 comparisons in bigint), so the sampled
# set is a pure function of the data: reproducible across engines, runs, and
# cluster sizes, and stable under appends. No engine RNG anywhere.
# ---------------------------------------------------------------------------

# First 8 hex chars of md5 as an integer in [0, 16^8) — same arithmetic text
# on both engines (shared with the KMV sketches).
from csv_parquet_s3_spark.operators.advanced import _KMV_HEX_INT  # noqa: E402

_DOC_HASH_SPARK = _KMV_HEX_INT.format(h="md5(cast(cast(doc_id as string) as binary))")
_DOC_HASH_DUCK = _KMV_HEX_INT.format(h="md5(CAST(doc_id AS VARCHAR))")

QUALITY_SCALE = 512  # docs with n_chars >= this are always kept


@register(
    "sample_documents_quality_weighted",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_DOC_HASH_DUCK} * {QUALITY_SCALE}
          < LEAST(n_chars, {QUALITY_SCALE}) * {16 ** 8}
    """,
)
def sample_documents_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by a quality proxy: keep probability
    min(1, n_chars/512) — longer documents survive, short ones thin out.
    The Bernoulli trial is hash(doc_id)·512 < min(n_chars,512)·2^32 in exact
    bigint arithmetic (no float thresholds → no engine-dependent edge rows).
    At 100 TB this is a map-only filter with full predicate pushdown above
    the scan; the weight column can be swapped for any model-scored quality
    signal without changing the shape."""
    docs = load_table(spark, sf_dir, "documents")
    keep = F.expr(
        f"{_DOC_HASH_SPARK} * {QUALITY_SCALE}"
        f" < least(n_chars, {QUALITY_SCALE}) * {16 ** 8}"
    )
    return docs.filter(keep).select("doc_id", "lang", "source", "n_chars")


@register(
    "rebalance_documents_by_lang",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
    ),
    target AS (SELECT MIN(n_lang) AS t FROM counts),
    thresholds AS (
        SELECT lang,
               CAST((CAST(t AS HUGEINT) * {16 ** 8} - 1) // n_lang AS BIGINT)
                   AS keep_max
        FROM counts CROSS JOIN target
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN thresholds c ON c.lang = d.lang
    WHERE {_DOC_HASH_DUCK} <= c.keep_max
    """,
)
def rebalance_documents_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance a skewed corpus to a uniform language mixture: every
    language is hash-downsampled toward the size of the SMALLEST language
    (keep rate target/n_lang). The Bernoulli trial is hash ≤ keep_max where
    keep_max = ⌊(target·2³² − 1)/n_lang⌋ is PRECOMPUTED per language in the
    |langs|-row counts frame using wide-decimal arithmetic — equivalent to
    hash·n_lang < target·2³² but with bounded per-row integers: the old
    formulation's hash·n_lang overflows signed 64-bit once a language holds
    ≳2³¹ documents (Spark wraps silently, DuckDB raises — engines diverge
    exactly at the scale the operator targets). The per-language thresholds
    come from one keyed aggregation joined back as a broadcast — the
    mixture-reweighting step of a training-data pipeline, with no collect
    and no RNG."""
    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint: counts feeds both the target scalar and the
    # thresholds — un-checkpointed, each replays the corpus aggregation.
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_lang")).transform(materialize)
    target = counts.agg(F.min("n_lang").alias("t"))
    thresholds = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        F.floor(
            (F.col("t").cast("decimal(38,0)") * (16 ** 8) - 1) / F.col("n_lang")
        )
        .cast("bigint")
        .alias("keep_max"),
    )
    return (
        docs.join(F.broadcast(thresholds), "lang")
        .filter(F.expr(_DOC_HASH_SPARK) <= F.col("keep_max"))
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Curriculum sharding: boundary-based global bucketing without a global sort.
# ---------------------------------------------------------------------------
CURRICULUM_SHARDS = 4
_CURRICULUM_PS = [i / CURRICULUM_SHARDS for i in range(1, CURRICULUM_SHARDS)]


@register(
    "curriculum_length_shards",
    oracle=f"""
    WITH b AS (
        SELECT quantile_cont(n_chars, {_CURRICULUM_PS}) AS qs FROM documents
    ),
    assigned AS (
        SELECT d.doc_id, d.n_chars,
               CASE WHEN d.n_chars <= b.qs[1] THEN 0
                    WHEN d.n_chars <= b.qs[2] THEN 1
                    WHEN d.n_chars <= b.qs[3] THEN 2
                    ELSE 3 END AS shard
        FROM documents d, b
    )
    SELECT CAST(shard AS INT) AS shard, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM assigned GROUP BY shard
    """,
)
def curriculum_length_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth curriculum shards over document length: exact global
    quantile boundaries (one small aggregate), then a map-only CASE
    assignment — per-shard counts and length ranges.

    Scale shape: the naive formulation (``ntile()`` over a global ORDER BY)
    funnels 100 TB through ONE window partition — a non-starter. Computing
    the {CURRICULUM_SHARDS - 1} boundaries first costs one aggregate whose
    result is a single row; broadcasting it back turns assignment into a
    stateless scan, which also means the same boundaries can re-shard future
    increments consistently (a curriculum must be stable across batches).
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` both
    linearly interpolate at rank p·(n−1), so the boundaries agree exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    ps = ", ".join(str(p) for p in _CURRICULUM_PS)
    b = docs.agg(F.expr(f"percentile(n_chars, array({ps}))").alias("qs"))
    shard = (
        F.when(F.col("n_chars") <= F.element_at("qs", 1), 0)
        .when(F.col("n_chars") <= F.element_at("qs", 2), 1)
        .when(F.col("n_chars") <= F.element_at("qs", 3), 2)
        .otherwise(3)
    )
    return (
        docs.crossJoin(F.broadcast(b))
        .select(shard.cast("int").alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe splitting: near-duplicate documents must land on the SAME
# side of a train/test split, or evaluation leaks training data (the split
# analog of benchmark decontamination). Split on the duplicate CLUSTER id,
# not the document id.
# ---------------------------------------------------------------------------
@register(
    "split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE shingled AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    shingles AS (
        SELECT DISTINCT doc_id, s AS shingle
        FROM shingled, UNNEST(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS t(s)
    ),
    {{bands}},
    {{pairs}},
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
    assigned AS (
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN {{bucket}} < {{train}} THEN 'train'
                WHEN {{bucket}} < {{trainvalid}} THEN 'valid'
                ELSE 'test' END AS split
    FROM assigned
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test split that cannot leak near-duplicates across the
    boundary: documents split by md5(duplicate-cluster id), so every member
    of a MinHash-LSH duplicate cluster lands on the same side (singletons
    split by their own id — identical distribution to the plain hash
    split). The oracle replays the full pair→closure→bucket pipeline, so
    the driver hash-pins the leakage-safety property itself, per document.

    At 100 TB the clusters come from the stored signature index (see
    minhash_index) and this op is one join + one map over the corpus.
    """
    from csv_parquet_s3_spark.operators.components import dedup_cluster_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = dedup_cluster_components(spark, sf_dir).select("doc_id", "cluster_id")
    assigned = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    return hash_split(assigned, "cluster_id").select("doc_id", "cluster_id", "split")


SOURCE_CAP = 5  # max documents kept per source/domain


@register(
    "cap_documents_per_source",
    oracle=f"""
    SELECT doc_id, source, lang, n_chars, rn FROM (
        SELECT doc_id, source, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    ) t WHERE rn <= {SOURCE_CAP}
    """,
)
def cap_documents_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most SOURCE_CAP documents per source, best
    quality first (n_chars proxy, doc_id tie-break) — the standard web-crawl
    curation guard against a single domain dominating the training mixture
    (boilerplate farms, mirrors, SEO spam).

    Scale shape: one hash shuffle on `source`, and Spark's WindowGroupLimit
    rewrite (3.5+) pushes the rank-≤-N filter BELOW the shuffle as a partial
    per-map-task top-N — a mega-domain with 10⁹ rows ships at most
    N·map_tasks rows to the reducer, never the domain. The quality column
    swaps for any model score without changing the plan."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SOURCE_CAP)
    )


# Fill the oracle template with the shared band/pair CTEs + bucket expr (the
# f-string above cannot reference them directly without brace collisions).
from csv_parquet_s3_spark.operators.dedup import _ORACLE_BANDS, _ORACLE_PAIR_CTES  # noqa: E402
from csv_parquet_s3_spark.plans.materialize import materialize

ORACLES["split_leakage_safe"] = ORACLES["split_leakage_safe"].format(
    bands=_ORACLE_BANDS,
    pairs=_ORACLE_PAIR_CTES,
    bucket=_bucket_expr("md5(CAST(cluster_id AS VARCHAR))"),
    train=TRAIN_PCT,
    trainvalid=TRAIN_PCT + VALID_PCT,
)


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis '06): each row
# draws u ∈ (0,1) and ranks by u^(1/w) — the top-k of that key IS an exact
# weighted sample without replacement, in one pass, mergeable across
# partitions (each partition keeps its local top-k; the global top-k of
# locals is the answer — exactly Spark's TakeOrdered physical shape).
# Deterministic u from md5(doc_id); ranking by the LOG form ln(u)/w
# (monotone in u^(1/w)), rounded to 9 digits with doc_id tie-break so the
# selected set is engine-portable.
# ---------------------------------------------------------------------------
ES_SAMPLE_K = 50


def _es_key(hash_expr: str) -> str:
    return (
        f"CAST(ROUND(LN((({hash_expr}) + 1) / 4294967296.0)"
        " / n_chars, 9) AS DOUBLE)"
    )


@register(
    "sample_documents_weighted_noreplace",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars, wkey FROM (
        SELECT doc_id, lang, source, n_chars,
               {_es_key(_DOC_HASH_DUCK)} AS wkey
        FROM documents
    ) t
    ORDER BY wkey DESC, doc_id
    LIMIT {ES_SAMPLE_K}
    """,
)
def sample_documents_weighted_noreplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-sample without replacement, inclusion odds ∝ n_chars
    (Efraimidis–Spirakis keys): one map-side key computation + a global
    top-k — no rejection loop, no sequential reservoir, no RNG state. At
    100 TB this is the ONLY principled weighted no-replacement sample that
    runs as a single pass: per-partition top-k then top-k of top-ks
    (Spark's TakeOrdered), shipping k rows per partition. Longer documents
    win more often; re-running is byte-identical (hash-derived u)."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.expr(_es_key(_DOC_HASH_SPARK)).alias("wkey"),
    )
    return keyed.orderBy(F.desc("wkey"), F.asc("doc_id")).limit(ES_SAMPLE_K)


# ---------------------------------------------------------------------------
# Temperature-scaled multilingual resampling (mT5 / UNIMAX family): target
# language shares proportional to n_l^alpha instead of a flat mixture.
# ---------------------------------------------------------------------------
TEMP_ALPHA = 0.7  # mixture temperature; 1.0 = natural, 0.0 = uniform


@register(
    "sample_documents_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
    ),
    nmin AS (SELECT MIN(n_lang) AS nm FROM counts),
    thresholds AS (
        SELECT lang,
               CAST(FLOOR(
                   CAST(ROUND(POWER(CAST(nm AS DOUBLE) / n_lang,
                                    {1 - TEMP_ALPHA}), 9) AS DECIMAL(11,9))
                   * {16 ** 8}) AS BIGINT) AS keep_max
        FROM counts CROSS JOIN nmin
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN thresholds c ON c.lang = d.lang
    WHERE {_DOC_HASH_DUCK} < c.keep_max
    """,
)
def sample_documents_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language rebalancing: keep rate
    (n_min/n_l)^(1-alpha) per language, so post-sampling shares are
    proportional to n_l^alpha — the standard multilingual-pretraining
    mixture (alpha≈0.7 boosts low-resource languages without flattening the
    head the way the uniform ``rebalance_documents_by_lang`` does; alpha=0
    recovers it exactly).

    Determinism: POWER is libm, so the rate is rounded to 9 digits FIRST,
    widened to DECIMAL(11,9), and multiplied by 2³² exactly — the
    per-language keep_max integer is identical on both engines and the
    Bernoulli trial ``hash < keep_max`` never rides a float comparison. The
    smallest language's rate is exactly 1.0 → keep_max = 2³² keeps every row
    (hashes live in [0, 2³²)). Same scale posture as the uniform rebalance:
    one |langs|-row aggregation broadcast back onto a map-only filter.
    """
    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint: the |langs|-row counts frame feeds both the min
    # scalar and the thresholds — un-checkpointed, each replays the corpus
    # aggregation.
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_lang")).transform(materialize)
    nmin = counts.agg(F.min("n_lang").alias("nm"))
    rate = F.round(
        F.pow(F.col("nm").cast("double") / F.col("n_lang"), 1 - TEMP_ALPHA), 9
    ).cast("decimal(11,9)")
    thresholds = counts.crossJoin(F.broadcast(nmin)).select(
        "lang",
        F.floor(rate * (16 ** 8)).cast("bigint").alias("keep_max"),
    )
    return (
        docs.join(F.broadcast(thresholds), "lang")
        .filter(F.expr(_DOC_HASH_SPARK) < F.col("keep_max"))
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Deterministic k-fold assignment + stratification audit in one query.
# ---------------------------------------------------------------------------
KFOLD_K = 5


@register(
    "split_documents_kfold",
    oracle=f"""
    WITH folds AS (
        SELECT doc_id, lang,
               CAST({_DOC_HASH_DUCK} % {KFOLD_K} AS INT) AS fold
        FROM documents
    ),
    lt AS (SELECT lang, COUNT(*) AS n_lang FROM folds GROUP BY lang)
    SELECT f.fold, f.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / lt.n_lang, 6) AS DOUBLE)
               AS lang_share
    FROM folds f JOIN lt ON lt.lang = f.lang
    GROUP BY f.fold, f.lang, lt.n_lang
    ORDER BY fold, f.lang
    """,
)
def split_documents_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {KFOLD_K}-fold cross-validation assignment
    (fold = doc-hash mod K — stable under corpus growth, no RNG, no driver
    state) with the stratification audit built in: per (fold, lang) counts
    and each fold's share of its language, which should sit near 1/K —
    systematic deviation means the hash is confounded with a stratum and the
    split would leak. The companion check to ``split_leakage_safe`` (group
    integrity) and ``split_documents_train_test`` (two-way split).

    Map-only fold assignment (pushdown-friendly), one keyed aggregation for
    the audit; at 100 TB the assignment column is written once at ingest and
    the audit reruns per snapshot.
    """
    docs = load_table(spark, sf_dir, "documents")
    folds = docs.select(
        "doc_id",
        "lang",
        (F.expr(_DOC_HASH_SPARK) % KFOLD_K).cast("int").alias("fold"),
    )
    lt = folds.groupBy("lang").agg(F.count("*").alias("n_lang"))
    return (
        folds.join(F.broadcast(lt), "lang")
        .groupBy("fold", "lang", "n_lang")
        .agg(F.count("*").alias("cnt"))
        .select(
            "fold",
            "lang",
            F.col("cnt").cast("bigint").alias("n_docs"),
            F.round(F.col("cnt").cast("double") / F.col("n_lang"), 6)
            .cast("double")
            .alias("lang_share"),
        )
        .orderBy("fold", "lang")
    )
