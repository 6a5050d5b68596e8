"""csv_parquet_s3_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference `LanceZhuang/csv-parquet-s3` (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, built-in
CSV/Parquet/S3A connectors, and partition-parallel operators designed for
100 TB scale.

Top-level surface:

- :mod:`csv_parquet_s3_spark.session` — SparkSession builder with parity confs.
- :mod:`csv_parquet_s3_spark.schema` — JSON schema declaration → StructType
  (mirror of the reference's SchemaLoader semantics).
- :mod:`csv_parquet_s3_spark.ingest` — schema-declared CSV → Parquet conversion
  (the reference's core capability).
- :mod:`csv_parquet_s3_spark.purge` — config-driven retention purge
  (the reference's AutoPurge capability).
- :mod:`csv_parquet_s3_spark.sinks` — local-Parquet and S3A object-store sinks.
- :mod:`csv_parquet_s3_spark.operators` — the analytics surface: relational
  queries, dedup, similarity search, text analysis, multimodal plumbing.
- :mod:`csv_parquet_s3_spark.streaming` — Structured Streaming mirrors of the
  batch pipelines.
"""

__version__ = "0.1.0"
