"""Property-based checks for greedy sequence packing over GENERATED corpora
(the static testdata never exercises oversized docs, empty shards, or
token counts that tile the window exactly). Invariants, per corpus:

- window discipline: every bin's fill ≤ CONTEXT_TOKENS unless it holds a
  single oversized document;
- greediness: the first doc of bin k+1 would have overflowed bin k;
- density: bin ids are 0..max contiguous per shard;
- conservation: every doc appears exactly once with its own token count;
- the Spark `applyInPandas` result equals the sequential Python fold (the
  same fold the recursive-CTE oracle replays).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csv_parquet_s3_spark.operators.packing import CONTEXT_TOKENS, pack_greedy

# (source, n_tokens) corpora; token counts straddle the window size
corpus = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.integers(min_value=1, max_value=CONTEXT_TOKENS + 50),
    ),
    min_size=1,
    max_size=40,
)


def _reference_fold(docs: list[tuple[int, int]]) -> dict[int, int]:
    """doc_id -> bin_id, the sequential greedy rule (doc_id order)."""
    out, fill, bin_id = {}, None, 0
    for doc_id, tok in sorted(docs):
        if fill is None:
            fill = tok
        elif fill + tok > CONTEXT_TOKENS:
            bin_id += 1
            fill = tok
        else:
            fill += tok
        out[doc_id] = bin_id
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus)
def test_pack_matches_sequential_fold_and_invariants(spark, corpus):
    rows = [
        (i, src, " ".join(["w"] * tok))
        for i, (src, tok) in enumerate(corpus)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    packed = pack_greedy(docs).collect()

    # conservation
    assert sorted(r.doc_id for r in packed) == sorted(r[0] for r in rows)

    by_source: dict = {}
    for r in packed:
        assert r.n_tokens == len(rows[r.doc_id][2].split(" "))
        by_source.setdefault(r.source, []).append(r)

    for source, members in by_source.items():
        want = _reference_fold([(r.doc_id, r.n_tokens) for r in members])
        fills: dict = {}
        for r in sorted(members, key=lambda r: r.doc_id):
            assert r.bin_id == want[r.doc_id]  # equals the sequential fold
            fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
        # density + window discipline
        assert sorted(fills) == list(range(len(fills)))
        counts: dict = {}
        for r in members:
            counts[r.bin_id] = counts.get(r.bin_id, 0) + 1
        for b, fill in fills.items():
            assert fill <= CONTEXT_TOKENS or counts[b] == 1
