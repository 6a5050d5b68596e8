"""Vectorized cosine top-k must equal the expression-based brute force."""

from __future__ import annotations

from csv_parquet_s3_spark.operators.similarity import (
    sim_cosine_topk_bruteforce,
    sim_cosine_topk_vectorized,
)

SF = "/root/testdata/sf0.01"


def test_vectorized_equals_expression_topk(spark):
    want = {
        (r.query_id, r.rn): (r.vec_id, r.cos_sim)
        for r in sim_cosine_topk_bruteforce(spark, SF).collect()
    }
    got = {
        (r.query_id, r.rn): (r.vec_id, r.cos_sim)
        for r in sim_cosine_topk_vectorized(spark, SF).collect()
    }
    assert len(got) == len(want) > 0
    for key, (vid, cs) in want.items():
        gvid, gcs = got[key]
        assert gvid == vid and abs(gcs - cs) < 1e-6, (key, (vid, cs), (gvid, gcs))
