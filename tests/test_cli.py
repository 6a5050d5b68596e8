"""CLI orchestrator: the reference Main.java pipeline end-to-end, plus the
purge and compact subcommands, driven exactly as an operator would."""

from __future__ import annotations

import pytest

import json
import subprocess
import sys

SCHEMA = {
    "fields": [
        {"name": "id", "type": "INT32", "repetition": "REQUIRED"},
        {"name": "name", "type": "BINARY", "logicalType": "STRING"},
        {"name": "amount", "type": "BINARY", "logicalType": "DECIMAL",
         "precision": 10, "scale": 2},
    ]
}


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "csv_parquet_s3_spark", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


@pytest.mark.slow
def test_pipeline_cli(tmp_path, spark):
    src, out = tmp_path / "csv", tmp_path / "parquet"
    src.mkdir()
    (src / "a.csv").write_text("id,name,amount\n1,x,1.005\n2,y,\n")
    (src / "b.csv").write_text("id,name,amount\n3,z,7\n")
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(json.dumps(SCHEMA))
    cfg = tmp_path / "app.properties"
    cfg.write_text(
        f"SourceFilePath={src}\nParquetFilePath={out}\n"
        "bucketName=unused\nprefix=unused\n"
    )

    r = _run(["pipeline", "--config", str(cfg), "--schema", str(schema_path),
              "--skip-upload"])
    assert r.returncode == 0, r.stderr
    assert "pipeline completed successfully" in r.stderr

    df = spark.read.parquet(str(out / "a.parquet"), str(out / "b.parquet"))
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 3 and str(rows[1].amount) == "1.01"

    # a bad strict cell fails that file AND the exit code (improvement over
    # the reference, which exits 0 on conversion failure)
    (src / "bad.csv").write_text("id,name,amount\nnot_int,q,1\n")
    r2 = _run(["pipeline", "--config", str(cfg), "--schema", str(schema_path),
               "--skip-upload"])
    assert r2.returncode == 1
    assert "conversion failed" in r2.stderr


@pytest.mark.slow
def test_purge_and_compact_cli(tmp_path, spark):
    root = tmp_path / "tables"
    (root / "t1").mkdir(parents=True)
    spark.range(100).selectExpr("id", "id % 10 AS k").repartition(8).write.mode(
        "overwrite"
    ).parquet(str(root / "t1"))

    pc = tmp_path / "purge.json"
    pc.write_text(json.dumps([
        {"table_name": "t1", "action": "CRITERIA",
         "sqlstatement": "k = 3", "max_record_count": 1000}
    ]))
    r = _run(["purge", "--purge-config", str(pc), "--tables-root", str(root)])
    assert r.returncode == 0, r.stderr
    assert spark.read.parquet(str(root / "t1")).filter("k = 3").count() == 0

    r2 = _run(["compact", "--path", str(root / "t1"), "--sort-by", "id"])
    assert r2.returncode == 0, r2.stderr
    assert "compacted" in r2.stderr


@pytest.mark.slow
def test_corpus_cli(tmp_path, spark):
    import csv as _csv

    from csv_parquet_s3_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    n_raw = docs.count()
    csv_dir = tmp_path / "landing"
    csv_dir.mkdir()
    with open(csv_dir / "b1.csv", "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["doc_id", "text", "lang"])
        w.writerows((r.doc_id, r.text, r.lang) for r in docs.collect())
    schema = tmp_path / "docs_schema.json"
    schema.write_text(json.dumps({
        "fields": [
            {"name": "doc_id", "type": "INT64", "repetition": "REQUIRED"},
            {"name": "text", "type": "BINARY", "logicalType": "STRING"},
            {"name": "lang", "type": "BINARY", "logicalType": "STRING"},
        ]
    }))

    out = tmp_path / "corpus_out"
    r = _run(["corpus", "--csv-dir", str(csv_dir), "--schema", str(schema),
              "--out", str(out)])
    assert r.returncode == 0, r.stderr
    assert "corpus pipeline:" in r.stderr

    final = spark.read.parquet(str(out / "final"))
    n_kept = final.count()
    assert 0 < n_kept < n_raw  # dedup removed something, kept most
    assert set(final.select("split").distinct().toPandas()["split"]) <= {
        "train", "valid", "test"
    }


def test_cli_query_list_and_run(tmp_path, capsys):
    from csv_parquet_s3_spark.__main__ import main

    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "dedup_minhash_lsh_pairs" in out

    dest = str(tmp_path / "q01_out")
    assert main([
        "query", "q01_pricing_summary",
        "--sf-dir", "/root/testdata/sf0.001", "--out", dest,
    ]) == 0
    import glob
    assert glob.glob(dest + "/*.parquet")

    assert main(["query", "no_such_query"]) == 1
