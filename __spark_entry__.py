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
# listed first. After the r12 window (50/50 hash-green, registry 236/236
# oracle-backed, no entry staler than r08) the r13 window is the rotation
# output PLUS re-pins at the head for the queries this round changed.
VERIFY_PRIORITY: list[str] = [
    # r13 window: RE-PINS FIRST — the 9 queries r13 touched: the four
    # perplexity rewrites (LM folded into a per-key term table, the
    # corpus-sized doc-keyed pre-aggregation exchange removed — kn /
    # add-k / unigram / held-out), the two vocab-hint drops
    # (tfidf df, contamination bench grams — sf0.1 plans unchanged,
    # re-pinned anyway), the gated streaming enrichment dim
    # (stream_segment_hourly_rollup), and the two delete-path entries
    # exercising the un-hinted delete_rows victim join. Then the
    # verbatim tools/rotate_window.py output against CORRECTNESS_r12
    # in its printed order (queue head = the r12-displaced tail
    # entries dedup_simhash_hamming_pairs / dedup_cluster_components /
    # mm_payload_stats / mm_frame_samples), minus the two re-pins it
    # already contained (text_bigram_perplexity,
    # text_heldout_perplexity); displaced tail entries
    # (dedup_minhash_incremental, mm_byte_histogram_features,
    # q_events_sessionize, q_events_user_daily_activity,
    # q_events_funnel, q_left_join_customer_order_counts,
    # q_full_outer_nation_presence) are all hash-green r09 — inside
    # the "no entry older than r08" staleness target.
    "text_bigram_kn_perplexity",
    "text_bigram_perplexity",
    "text_unigram_perplexity",
    "text_heldout_perplexity",
    "text_tfidf_top_terms",
    "text_benchmark_contamination",
    "stream_segment_hourly_rollup",
    "retrieval_bm25_after_delete",
    "sim_cosine_topk_ivf_after_delete",
    "dedup_simhash_hamming_pairs",
    "dedup_cluster_components",
    "mm_payload_stats",
    "mm_frame_samples",
    "dedup_embedding_cosine_pairs",
    "dedup_ngram_jaccard_blocked",
    "dedup_embedding_ivf_blocked",
    "q01_pricing_summary",
    "q03_top_unshipped",
    "q04_order_priority",
    "q05_regional_revenue",
    "q06_forecast_revenue",
    "q10_top_customers",
    "q_semi_customers_with_open_orders",
    "q_anti_customers_without_open_orders",
    "q_window_top3_parts_per_brand",
    "q_window_supplier_rank",
    "q_window_running_revenue",
    "q_rollup_revenue",
    "q_cube_order_status",
    "q_pivot_revenue_by_status",
    "q_union_active_parties",
    "q_except_only_open_customers",
    "q_intersect_both_status_customers",
    "q_distinct_agg",
    "q_filter_predicates",
    "q_topk_orders_by_value",
    "q_scalar_string_funcs",
    "q_scalar_date_math_funcs",
    "q_events_hourly",
    "q_customer_value_deciles",
    "q_event_type_affinity",
    "sim_cosine_topk_pq",
    "sim_cosine_topk_ivf_pq",
    "q_customer_rfm_segments",
    "q_model_gains_table",
    "stream_click_purchase_left_outer",
    "stream_click_purchase_right_outer",
    "stream_click_purchase_full_outer",
    "graph_label_propagation",
    "q_events_user_ewma",
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
