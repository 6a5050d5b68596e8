"""Config loader + S3A sink plumbing tests (F5 layout parity)."""

from __future__ import annotations

import pytest

from csv_parquet_s3_spark.config import load_properties, validate
from csv_parquet_s3_spark.sinks.s3 import configure_s3a, sink_path, write_parquet


@pytest.fixture
def props_file(tmp_path):
    p = tmp_path / "application.properties"
    p.write_text(
        "# comment\n"
        "bucketName=my-bucket\n"
        "prefix=loads/daily\n"
        "SourceFilePath=in/csv\n"
        "ParquetFilePath=out/parquet\n"
        "s3.accessKey=AK\n"
        "s3.secretKey=SK\n"
        "s3.endpoint=https://s3.example.com:9021\n"
        "s3.region=custom\n"
    )
    return str(p)


def test_load_properties(props_file):
    props = load_properties(props_file)
    assert props["bucketName"] == "my-bucket"
    assert props["s3.endpoint"] == "https://s3.example.com:9021"
    assert "# comment" not in props
    validate(props, require_s3=True)


def test_validate_missing_keys():
    with pytest.raises(ValueError, match="bucketName"):
        validate({"prefix": "x"})


def test_sink_path_layout():
    # key layout {bucket}/{prefix}/{file} (S3Uploader.java:81)
    assert sink_path("b", "p") == "s3a://b/p/"
    assert sink_path("b", "/nested/pre/") == "s3a://b/nested/pre/"


def test_configure_s3a_sets_hadoop_conf(spark, props_file):
    configure_s3a(spark, load_properties(props_file))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AK"
    assert hconf.get("fs.s3a.secret.key") == "SK"
    assert hconf.get("fs.s3a.endpoint") == "https://s3.example.com:9021"
    assert hconf.get("fs.s3a.endpoint.region") == "custom"
    assert hconf.get("fs.s3a.path.style.access") == "true"


def test_write_parquet_same_path_as_s3(spark, tmp_path):
    """The s3a:// writer is the same code path as file:// — exercise it."""
    df = spark.range(100).withColumnRenamed("id", "n")
    out = str(tmp_path / "sink")
    write_parquet(df, out)
    assert spark.read.parquet(out).count() == 100
