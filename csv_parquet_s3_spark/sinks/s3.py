"""S3-compatible object-store sink via the Hadoop S3A connector.

Replaces the reference's hand-rolled parallel uploader
(`/root/reference/src/main/java/com/rbccm/database/tools/S3Uploader.java:33-93`)
with Spark's native ``s3a://`` filesystem: static credentials, custom
endpoint + region, path-style access (the reference's custom-endpoint setup
implies path-style), parallel multipart PUTs, and committer-based atomicity —
all configuration, no upload code.

Key layout parity: objects land at ``s3a://{bucket}/{prefix}/...``
(S3Uploader.java:81 builds ``prefix + "/" + fileName``).

The S3A jars ship with a real cluster's Hadoop distribution; this container
has no S3 endpoint, so tests exercise :func:`configure_s3a` (conf plumbing)
and :func:`sink_path` (layout), and write through the same writer against
``file://`` paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from csv_parquet_s3_spark.session import PARQUET_BLOCK_SIZE


def configure_s3a(spark: SparkSession, props: dict[str, str]) -> None:
    """Apply the reference's S3 client settings as Hadoop S3A conf.

    Mirrors S3Uploader.buildClient (S3Uploader.java:42-48): static creds,
    custom endpoint, custom region, Apache HTTP client → connection pool.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    mapping = {
        "fs.s3a.access.key": props.get("s3.accessKey"),
        "fs.s3a.secret.key": props.get("s3.secretKey"),
        "fs.s3a.endpoint": props.get("s3.endpoint"),
        "fs.s3a.endpoint.region": props.get("s3.region"),
    }
    for key, value in mapping.items():
        if value:
            hconf.set(key, value)
    # Custom endpoints (the reference's on-prem S3) need path-style access.
    hconf.set("fs.s3a.path.style.access", "true")
    hconf.set("fs.s3a.connection.maximum", "64")
    # Directory-committer semantics for object stores (no O(n) renames).
    hconf.set("fs.s3a.committer.name", "magic")


def sink_path(bucket: str, prefix: str, scheme: str = "s3a") -> str:
    """Object key layout: {bucket}/{prefix}/ (S3Uploader.java:81)."""
    return f"{scheme}://{bucket}/{prefix.strip('/')}/"


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Parquet sink with the reference's writer settings (snappy, 128 MiB
    row groups — Main.java:44, CsvToParquetConverter.java:229-230)."""
    (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("parquet.block.size", str(PARQUET_BLOCK_SIZE))
        .parquet(path)
    )


def upload_dataset(
    spark: SparkSession, df: DataFrame, props: dict[str, str], mode: str = "overwrite"
) -> str:
    """Write a DataFrame to the configured bucket/prefix; returns the URI."""
    configure_s3a(spark, props)
    uri = sink_path(props["bucketName"], props.get("prefix", ""))
    write_parquet(df, uri, mode=mode)
    return uri
