"""End-to-end training-data pipeline: CSV ingest → near-dup index → cluster →
keep-one-per-cluster → deterministic split → compacted layout.

One test composing the engine's stages the way a real corpus pipeline would,
asserting the row accounting at every step.
"""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from csv_parquet_s3_spark.ingest import convert_csv_dir
from csv_parquet_s3_spark.maintenance import compact, parquet_file_count
from csv_parquet_s3_spark.operators.components import connected_components
from csv_parquet_s3_spark.operators.minhash_index import (
    build_index,
    pairs_from_index,
)
from csv_parquet_s3_spark.operators.sampling import hash_split
from csv_parquet_s3_spark.schema import FieldSpec
from csv_parquet_s3_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

SPECS = [
    FieldSpec("doc_id", "INT64", None, required=True),
    FieldSpec("text", "BINARY", "STRING"),
    FieldSpec("lang", "BINARY", "STRING"),
]


def test_corpus_pipeline(spark, tmp_path):
    # 0. raw corpus lands as CSV (simulating the upstream producer)
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    n_raw = docs.count()
    csv_dir = tmp_path / "landing"
    csv_dir.mkdir()
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]
    with open(csv_dir / "batch1.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["doc_id", "text", "lang"])
        w.writerows(rows)

    # 1. schema-declared ingest (scale path: whole dir, one distributed job)
    corpus_path = str(tmp_path / "corpus")
    typed = convert_csv_dir(spark, str(csv_dir), corpus_path, specs=SPECS)
    assert typed.count() == n_raw
    assert dict(typed.dtypes)["doc_id"] == "bigint"

    # 2. near-dup signature index + verified pairs
    idx = str(tmp_path / "sig_index")
    build_index(spark, typed, idx)
    pairs = pairs_from_index(spark, idx)
    n_pairs = pairs.count()
    assert n_pairs > 0

    # 3. transitive closure → clusters → keep one doc per cluster
    comp = connected_components(pairs, "doc_id_a", "doc_id_b")
    dup_docs = comp.count()
    survivors_in_clusters = comp.filter(F.col("vertex") == F.col("component")).count()
    keep = typed.join(
        comp.filter(F.col("vertex") != F.col("component")).select(
            F.col("vertex").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    )
    n_kept = keep.count()
    assert n_kept == n_raw - (dup_docs - survivors_in_clusters)
    assert n_kept < n_raw  # something was actually deduped

    # 4. deterministic split of the survivors
    split = hash_split(keep, "doc_id")
    by_split = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == n_kept and by_split["train"] > 0

    # 5. final layout: compacted dataset, data intact
    out = str(tmp_path / "final")
    split.write.mode("overwrite").parquet(out)
    compact(spark, out, target_file_bytes=256 * 1024 * 1024)
    final = spark.read.parquet(out)
    assert final.count() == n_kept
    assert parquet_file_count(out) >= 1
