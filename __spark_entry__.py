"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`csv_parquet_s3_spark.operators` — one registry
entry per operator from SURVEY.md §2 plus the driver-mandated extensions
(dedup, similarity search, text analysis, multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path from any cwd; make the package
# importable regardless.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Regional supplier revenue (TPC-H Q5 shape): 6-way join with broadcast
    dims + filtered fact scan + hash aggregation — exercises session, scan,
    filter pushdown, join selection, and aggregation end-to-end.
    """
    from csv_parquet_s3_spark.operators.relational import q05_regional_revenue

    return q05_regional_revenue(spark, SF0001)


# Round-robin verification window (see PARITY.md "Driver verification
# rotation"): the driver's correctness check covers the FIRST 50 entries of
# queries(), so each round the entries most in need of a fresh signal are
# listed first. The r10 window = tools/rotate_window.py output against
# CORRECTNESS_r01..r09 with the r09-verdict-ordered insertions:
# (0a) FIVE re-pins for the BM25 stored-index entries whose artifacts and
#      plans changed in r10 (bm25_layout 4: dl denormalized onto doc_tf,
#      stats folded to literals — locally 3-SF hash-green on the new
#      layout, but the slots must re-earn the driver row);
# (0b) q_approx_sketches — converted this round from the registry's last
#      rows-only entry to an ε-bound-checked one (exact quantities +
#      in-bound booleans; oracle pins the flags TRUE): first hash row;
# (0c) the FOUR sim entries the r09 re-pins displaced (the r09-verdict
#      queue head, r04-stale);
# (0d) the remaining ≤r04 tail from the rotation output;
# then the rotation's r05 greens, trimmed to the 50-slot window (the six
# entries the 0a/0b insertions displace move to the r11 queue:
# q_table_profile_orders, q_orders_quality_rules,
# stream_events_sliding_rollup, stream_scd1_upsert_priority,
# stream_events_content_digest, scd2_point_in_time_join — recorded in
# NOTES/PARITY).
VERIFY_PRIORITY: list[str] = [
    # tier 0a: re-pins for entries whose stored artifacts/plans changed in
    # r10 (bm25_layout 4: dl denormalized + literal stats; ANN format 5:
    # wide sq8_codes + map-side array-fold serving)
    "retrieval_bm25_from_index",
    "retrieval_bm25_after_delete",
    "retrieval_bm25_incremental",
    "retrieval_bm25_compacted",
    "stream_bm25_index_maintenance",
    "sim_cosine_topk_ivf_sq8_from_index",
    # tier 0b: rows-only → ε-bound oracle conversion (first hash row)
    "q_approx_sketches",
    # tier 0c: the r09-displaced sim entries (r04-stale, r09-verdict head)
    "sim_cosine_topk_bruteforce",
    "sim_cosine_topk_ivf_label",
    "sim_cosine_topk_ivf_probe",
    "sim_cosine_topk_ivf_pq_residual",
    # tier 0d: the rest of the ≤r04 tail (rotation order)
    "sim_cosine_topk_sq8",
    "sim_cosine_topk_ivf_sq8",
    "stream_events_hourly_rollup",
    "stream_events_session_windows",
    "stream_click_purchase_attribution",
    "stream_user_lifetime_totals",
    "text_unigram_perplexity",
    # rotation output: the stalest r05 greens, registry order
    "sketch_countmin_user_counts",
    "q_open_orders_daily",
    "q_table_content_digest",
    "q_fk_orphan_audit",
    "q_segment_user_bitmap_distinct",
    "q_segment_bitmap_overlap",
    "dedup_sorted_neighborhood_pairs",
    "dedup_containment_pairs",
    "dedup_prefix_filter_pairs",
    "dedup_normalized_exact",
    "graph_triangle_count",
    "graph_common_neighbors",
    "layout_zorder_zonemap",
    "dedup_minhash_pairs_from_index",
    "mm_wave_window_features",
    "mm_payload_ahash",
    "dedup_modality_agreement",
    "batch_by_length_buckets",
    "split_leakage_safe",
    "cap_documents_per_source",
    "sample_documents_weighted_noreplace",
    "pipeline_corpus_training_set",
    "pipeline_customer_feature_snapshot",
    "sim_srp_hamming_topk",
    "q_user_value_trend",
    "q_join_key_skew_profile",
    "q_incremental_hourly_rollup",
    "q_events_value_winsorized",
    "q_events_transition_matrix",
    "q_events_cumulative_unique_users",
    "emb_vector_qa_stats",
    "emb_hard_negatives",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions).

    Ordered so the driver's bounded correctness window lands on the entries
    that most need a fresh signal this round (VERIFY_PRIORITY), then every
    remaining query in registration order.
    """
    from csv_parquet_s3_spark.operators import QUERIES

    missing = [n for n in VERIFY_PRIORITY if n not in QUERIES]
    if missing:  # a rename must fail loudly, not silently shrink the window
        raise KeyError(f"VERIFY_PRIORITY names not in registry: {missing}")
    ordered = {n: QUERIES[n] for n in VERIFY_PRIORITY}
    ordered.update((n, fn) for n, fn in QUERIES.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries get a rows-only check."""
    from csv_parquet_s3_spark.operators import ORACLES

    return dict(ORACLES)
