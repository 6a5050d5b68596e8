"""Analytics operator surface.

Importing this package pulls in every operator module so their queries land in
the shared registry (:mod:`csv_parquet_s3_spark.operators.registry`).
"""

from csv_parquet_s3_spark.operators import (  # noqa: F401
    advanced,
    components,
    dedup,
    grouped_pandas,
    layout,
    minhash_index,
    multimodal,
    neardup,
    outer_json,
    packing,
    pipeline,
    privacy,
    projection,
    relational,
    reshape,
    retrieval,
    sampling,
    scd,
    similarity,
    similarity_index,
    statistics,
    streaming_batch,
    textstats,
    tokenizer,
    tpch_ext,
)
from csv_parquet_s3_spark.operators.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
