"""BPE merge learning — tokenizer TRAINING as a distributed query.

`textstats.text_bpe_token_stats` estimates the COST of a fixed pre-tokenizer;
this module learns the merge table itself: the byte-pair-encoding loop
(Sennrich et al. '16) that every modern tokenizer (GPT-2 BPE, SentencePiece
BPE mode) runs over the training corpus. Each round counts adjacent symbol
pairs (weighted by word frequency), picks the most frequent pair, and merges
its non-overlapping left-to-right occurrences; after K rounds the ranked
merge list IS the tokenizer artifact.

The sequential greedy-merge semantics inside a word ("aaa" + merge (a,a) →
["aa","a"], not ["a","aa"] or overlap) is the part engines get wrong: it
looks like a per-word loop. It is window-expressible: within each maximal
run of CONSECUTIVE matching positions, greedy non-overlapping = every other
position starting from the first — i.e. odd parity of the row number inside
the island (islands via the pos − row_number() gaps-and-islands trick). So
the whole training loop stays declarative: no UDF, no collect; the oracle
replays K unrolled rounds of identical SQL.

Scale shape: pair counting is the only corpus-proportional step (one keyed
aggregate per round, map-side combined; at real scale the word-frequency
table is Zipf-truncated exactly as here). The merge rewrite touches the
long-form symbol table — rows shrink every round — keyed by word; the top
pair attaches via a one-row broadcast, never a collect. Lineage is
localCheckpoint-truncated per round (house discipline for iterative plans,
cf. components.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table
from csv_parquet_s3_spark.plans.materialize import materialize

BPE_TOP_WORDS = 128  # train on the top-W vocabulary (Zipf truncation)
BPE_MERGES = 5       # merge rounds to learn


def _bpe_words_oracle() -> str:
    return f"""
    words AS (
        SELECT tok AS word, COUNT(*) AS wn
        FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY wn DESC, word
        LIMIT {BPE_TOP_WORDS}
    ),
    s0 AS (
        SELECT word, wn, CAST(u.i AS BIGINT) AS pos,
               substr(word, CAST(u.i AS INT), 1) AS sym
        FROM words, UNNEST(range(1, length(word) + 1)) AS u(i)
    )"""


def _bpe_round_oracle(r: int) -> str:
    """CTE block for merge round r: pair counts over s{r-1}, the top pair
    t{r}, greedy non-overlapping merge sites via island parity, and the
    rewritten symbol table s{r}."""
    p = r - 1
    return f"""
    pc{r} AS (
        SELECT sym AS a, nxt AS b, SUM(wn) AS cnt
        FROM (SELECT word, wn, sym,
                     lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
              FROM s{p})
        WHERE nxt IS NOT NULL
        GROUP BY sym, nxt
    ),
    t{r} AS (
        SELECT a, b, cnt FROM pc{r}
        ORDER BY cnt DESC, a, b LIMIT 1
    ),
    m{r} AS (
        SELECT s.word, s.wn, s.pos, s.sym,
               lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt
        FROM s{p} s
    ),
    mk{r} AS (
        SELECT m.word, m.wn, m.pos, m.sym, t.a, t.b,
               CASE WHEN m.sym = t.a AND m.nxt = t.b THEN 1 ELSE 0 END
                   AS hit
        FROM m{r} m CROSS JOIN t{r} t
    ),
    g{r} AS (
        SELECT word, wn, pos, sym, a, b, hit,
               pos - ROW_NUMBER() OVER (PARTITION BY word, hit ORDER BY pos)
                   AS grp
        FROM mk{r}
    ),
    isl{r} AS (
        SELECT word, wn, pos, sym, a, b, hit,
               CASE WHEN hit = 1 THEN
                   ROW_NUMBER() OVER (PARTITION BY word, grp, hit
                                      ORDER BY pos) % 2
               ELSE 0 END AS take
        FROM g{r}
    ),
    s{r} AS (
        SELECT word, wn,
               ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
               CASE WHEN take = 1 THEN a || b ELSE sym END AS sym
        FROM isl{r} i
        WHERE NOT EXISTS (
            SELECT 1 FROM isl{r} x
            WHERE x.word = i.word AND x.pos = i.pos - 1 AND x.take = 1)
    )"""


def _bpe_oracle() -> str:
    blocks = [_bpe_words_oracle()]
    blocks += [_bpe_round_oracle(r) for r in range(1, BPE_MERGES + 1)]
    finals = "\n    UNION ALL\n".join(
        f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM t{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return "WITH" + ",".join(blocks) + "\n    " + finals


def _merge_round(s: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE round over the long-form symbol table (word, wn, pos, sym):
    returns (top-pair frame with 1 row, rewritten symbol table)."""
    wp = W.partitionBy("word").orderBy("pos")
    pairs = (
        s.withColumn("nxt", F.lead("sym").over(wp))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("wn").alias("cnt"))
    )
    top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
    mk = (
        s.withColumn("nxt", F.lead("sym").over(wp))
        .crossJoin(F.broadcast(top))
        .withColumn(
            "hit",
            F.when(
                (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b")), 1
            ).otherwise(0),
        )
    )
    isl = mk.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(W.partitionBy("word", "hit").orderBy("pos")),
    ).withColumn(
        "take",
        F.when(
            F.col("hit") == 1,
            F.row_number().over(W.partitionBy("word", "grp", "hit").orderBy("pos"))
            % 2,
        ).otherwise(0),
    )
    consumed = isl.filter(F.col("take") == 1).select(
        F.col("word").alias("cw"), (F.col("pos") + 1).alias("cp")
    )
    rebuilt = (
        isl.join(
            consumed,
            (F.col("word") == F.col("cw")) & (F.col("pos") == F.col("cp")),
            "left_anti",
        )
        .select(
            "word",
            "wn",
            F.row_number().over(wp).alias("pos"),
            F.when(F.col("take") == 1, F.concat("a", "b"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    return top, rebuilt


@register("text_bpe_learn_merges", oracle=_bpe_oracle())
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {BPE_MERGES} BPE merges from the corpus vocabulary
    (top {BPE_TOP_WORDS} words by frequency, frequency-weighted pair
    counts): output is the ranked merge table (merge_rank, left_sym,
    right_sym, pair_count) — the artifact a tokenizer ships. Round r's
    counts see round r-1's merges, so learned symbols compose (e.g. 'e'+'s'
    then 'es'+'t'). Ties break by (count DESC, pair lexicographic) —
    deterministic on both engines; the oracle unrolls the same {BPE_MERGES}
    rounds as chained CTEs with the identical island-parity greedy merge.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count("*").alias("wn"))
        .orderBy(F.desc("wn"), "word")
        .limit(BPE_TOP_WORDS)
    )
    s = words.select(
        "word",
        "wn",
        F.explode(F.expr("sequence(1, length(word))")).alias("pos"),
    ).select(
        "word",
        "wn",
        F.col("pos").cast("bigint").alias("pos"),
        F.expr("substr(word, CAST(pos AS INT), 1)").alias("sym"),
    )
    s = s.transform(materialize)
    merges = None
    for r in range(1, BPE_MERGES + 1):
        top, s = _merge_round(s)
        s = s.transform(materialize)
        row = top.select(
            F.lit(r).alias("merge_rank"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.col("cnt").cast("bigint").alias("pair_count"),
        )
        merges = row if merges is None else merges.unionByName(row)
    return merges


# ---------------------------------------------------------------------------
# Apply the learned merges: encode the corpus with the trained tokenizer.
# Real tokenizers encode per DISTINCT WORD and cache (Zipf makes the
# vocabulary tiny next to the corpus), so the merge loop here runs over the
# distinct-word symbol table and a final join prices every document —
# the corpus itself is touched exactly twice (tokenize, then join+sum).
# ---------------------------------------------------------------------------


def _apply_round_oracle(r: int) -> str:
    """CTE block applying trained merge t{r} to the vocab table v{r-1}
    (same island-parity greedy rewrite as training, pair fixed by t{r})."""
    p = r - 1
    return f"""
    vm{r} AS (
        SELECT v.word, v.pos, v.sym, t.a, t.b,
               CASE WHEN v.sym = t.a
                         AND lead(v.sym) OVER (PARTITION BY v.word
                                               ORDER BY v.pos) = t.b
                    THEN 1 ELSE 0 END AS hit
        FROM v{p} v CROSS JOIN t{r} t
    ),
    vg{r} AS (
        SELECT word, pos, sym, a, b, hit,
               pos - ROW_NUMBER() OVER (PARTITION BY word, hit ORDER BY pos)
                   AS grp
        FROM vm{r}
    ),
    vi{r} AS (
        SELECT word, pos, sym, a, b,
               CASE WHEN hit = 1 THEN
                   ROW_NUMBER() OVER (PARTITION BY word, grp, hit
                                      ORDER BY pos) % 2
               ELSE 0 END AS take
        FROM vg{r}
    ),
    v{r} AS (
        SELECT word,
               ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
               CASE WHEN take = 1 THEN a || b ELSE sym END AS sym
        FROM vi{r} i
        WHERE NOT EXISTS (
            SELECT 1 FROM vi{r} x
            WHERE x.word = i.word AND x.pos = i.pos - 1 AND x.take = 1)
    )"""


def _bpe_apply_oracle() -> str:
    blocks = [_bpe_words_oracle()]
    blocks += [_bpe_round_oracle(r) for r in range(1, BPE_MERGES + 1)]
    blocks.append("""
    doc_toks AS (
        SELECT doc_id, tok AS word
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tok
              FROM documents)
    ),
    v0 AS (
        SELECT word, CAST(u.i AS BIGINT) AS pos,
               substr(word, CAST(u.i AS INT), 1) AS sym
        FROM (SELECT DISTINCT word FROM doc_toks) w,
             UNNEST(range(1, length(word) + 1)) AS u(i)
    )""")
    blocks += [_apply_round_oracle(r) for r in range(1, BPE_MERGES + 1)]
    blocks.append(f"""
    wlen AS (
        SELECT word, COUNT(*) AS n_syms, MAX(pos) AS _mx
        FROM v{BPE_MERGES} GROUP BY word
    )""")
    return (
        "WITH"
        + ",".join(blocks)
        + """
    SELECT d.doc_id,
           CAST(SUM(length(d.word)) AS BIGINT) AS n_chars,
           CAST(SUM(w.n_syms) AS BIGINT) AS n_bpe_tokens,
           CAST(ROUND(CAST(SUM(w.n_syms) AS DOUBLE)
                / SUM(length(d.word)), 6) AS DOUBLE) AS tokens_per_char
    FROM doc_toks d JOIN wlen w ON w.word = d.word
    GROUP BY d.doc_id
    """
    )


def _apply_merge(v: DataFrame, top: DataFrame) -> DataFrame:
    """Apply one trained merge (1-row frame (a, b)) to the vocab symbol
    table (word, pos, sym) — training's rewrite with the pair fixed."""
    wp = W.partitionBy("word").orderBy("pos")
    mk = (
        v.withColumn("nxt", F.lead("sym").over(wp))
        .crossJoin(F.broadcast(top))
        .withColumn(
            "hit",
            F.when(
                (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b")), 1
            ).otherwise(0),
        )
    )
    isl = mk.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(W.partitionBy("word", "hit").orderBy("pos")),
    ).withColumn(
        "take",
        F.when(
            F.col("hit") == 1,
            F.row_number().over(W.partitionBy("word", "grp", "hit").orderBy("pos"))
            % 2,
        ).otherwise(0),
    )
    consumed = isl.filter(F.col("take") == 1).select(
        F.col("word").alias("cw"), (F.col("pos") + 1).alias("cp")
    )
    return (
        isl.join(
            consumed,
            (F.col("word") == F.col("cw")) & (F.col("pos") == F.col("cp")),
            "left_anti",
        )
        .select(
            "word",
            F.row_number().over(wp).alias("pos"),
            F.when(F.col("take") == 1, F.concat("a", "b"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


@register("text_bpe_apply_merges", oracle=_bpe_apply_oracle())
def text_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the merges learned by
    `text_bpe_learn_merges`: per doc, character count, BPE token count
    after the {BPE_MERGES} ranked merges, and tokens-per-char — the
    fertility number that decides whether a tokenizer is worth shipping
    for a corpus.

    Scale shape: the merge loop rewrites the DISTINCT-WORD symbol table
    (Zipf-bounded, not corpus-bounded) — the encode-with-cache trick every
    production tokenizer uses; the corpus appears only in the initial
    tokenize and the final word→doc join+sum (two shuffles on word/doc).
    Merges attach as one-row broadcasts in rank order; greedy
    non-overlapping rewrite is the same island-parity window as training.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = text_bpe_learn_merges(spark, sf_dir).transform(materialize)
    doc_toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("word"),
    )
    v = (
        doc_toks.select("word")
        .distinct()
        .select(
            "word",
            F.explode(F.expr("sequence(1, length(word))")).alias("pos"),
        )
        .select(
            "word",
            F.col("pos").cast("bigint").alias("pos"),
            F.expr("substr(word, CAST(pos AS INT), 1)").alias("sym"),
        )
        .transform(materialize)
    )
    for r in range(1, BPE_MERGES + 1):
        top = merges.filter(F.col("merge_rank") == r).select(
            F.col("left_sym").alias("a"), F.col("right_sym").alias("b")
        )
        v = _apply_merge(v, top).transform(materialize)
    wlen = v.groupBy("word").agg(F.count("*").alias("n_syms"))
    return (
        doc_toks.join(wlen, "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_syms").cast("double") / F.sum(F.length("word")), 6
            )
            .cast("double")
            .alias("tokens_per_char"),
        )
    )
