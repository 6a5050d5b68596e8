"""Property-based checks for the MinHash/LSH dedup pipeline over GENERATED
corpora (the static testdata never exercises exact duplicates, empty or
sub-shingle documents). Invariants, per generated corpus:

- verified pairs never include a false positive: every emitted pair's true
  shingle-set Jaccard is ≥ the threshold (the verify step guarantees this
  regardless of LSH bucketing luck);
- exact duplicates (identical text, ≥ 3 tokens) are ALWAYS paired with
  jaccard 1.0 — identical signatures share every band bucket;
- pair keys are canonical (doc_id_a < doc_id_b, no self-pairs);
- connected components put every exact-duplicate family in one cluster.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_parquet_s3_spark.operators.components import connected_components
from csv_parquet_s3_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    signature_table,
    verified_pairs_from_signatures,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

doc_texts = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)


def _true_jaccard(a: str, b: str) -> float:
    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sa, sb = sh(a), sh(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(doc_texts, min_size=2, max_size=12),
    dup_of=st.integers(min_value=0, max_value=3),
)
@pytest.mark.slow
def test_lsh_pipeline_invariants(spark, texts, dup_of):
    # plant one exact duplicate of an existing doc
    texts = list(texts) + [texts[dup_of % len(texts)]]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    from pyspark.sql import functions as F

    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(toks)-3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
            )
        ).alias("shingle"),
    )
    sigs = signature_table(shingles)
    pairs = verified_pairs_from_signatures(sigs).collect()

    for r in pairs:
        assert r.doc_id_a < r.doc_id_b
        true_j = _true_jaccard(texts[r.doc_id_a], texts[r.doc_id_b])
        assert true_j >= JACCARD_THRESHOLD  # no false positives survive verify
        assert abs(round(true_j, 6) - r.jaccard) < 1e-9

    # every exact-duplicate pair with >= 3 tokens must be found
    planted = [
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if texts[i] == texts[j] and len(texts[i].split(" ")) >= 3
    ]
    found = {(r.doc_id_a, r.doc_id_b) for r in pairs}
    for p in planted:
        assert p in found
        exact = [r.jaccard for r in pairs if (r.doc_id_a, r.doc_id_b) == p]
        assert exact == [1.0]

    # duplicate families cluster together
    if pairs:
        pair_df = spark.createDataFrame(
            [(r.doc_id_a, r.doc_id_b) for r in pairs], "doc_id_a bigint, doc_id_b bigint"
        )
        comp = {
            r.vertex: r.component
            for r in connected_components(pair_df, "doc_id_a", "doc_id_b").collect()
        }
        for i, j in planted:
            assert comp[i] == comp[j]


def test_prefix_filter_pairs_superset_of_lsh(spark):
    """Prefix filtering is EXACT (recall 1.0 at its τ); MinHash-LSH at the
    same τ can only miss pairs. So the LSH pair set must be a subset of the
    prefix-filter pair set, and every shared pair carries the same exact
    Jaccard value."""
    from csv_parquet_s3_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        PREFIX_JACCARD_THRESHOLD,
        dedup_minhash_lsh_pairs,
        dedup_prefix_filter_pairs,
    )

    assert PREFIX_JACCARD_THRESHOLD == JACCARD_THRESHOLD
    sf = "/root/testdata/sf0.001"
    exact = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup_prefix_filter_pairs(spark, sf).collect()
    }
    lsh = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup_minhash_lsh_pairs(spark, sf).collect()
    }
    assert len(exact) > 0
    missing = set(lsh) - set(exact)
    assert not missing, f"exact pair set missing LSH pairs: {sorted(missing)[:5]}"
    for k in lsh:
        assert lsh[k] == exact[k]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(doc_texts, min_size=2, max_size=10),
    dup_of=st.integers(min_value=0, max_value=3),
)
@pytest.mark.slow
def test_prefix_filter_is_exact_on_random_corpora(spark, texts, dup_of):
    """Prefix filtering must return EXACTLY the brute-force Jaccard-≥-τ pair
    set — no false negatives (the pigeonhole guarantee) and no false
    positives (the verify step) — on arbitrary corpora."""
    from pyspark.sql import functions as F

    from csv_parquet_s3_spark.operators.dedup import (
        PREFIX_JACCARD_THRESHOLD,
        prefix_filter_pairs,
    )

    texts = list(texts) + [texts[dup_of % len(texts)]]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(toks)-3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
            )
        ).alias("shingle"),
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in prefix_filter_pairs(shingles).collect()
    }
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            tj = _true_jaccard(texts[i], texts[j])
            if tj >= PREFIX_JACCARD_THRESHOLD:
                want[(i, j)] = round(tj, 6)
    assert got == want
