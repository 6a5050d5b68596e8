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
# listed first. After the r10 window (50/50 hash-green, registry 236/236
# oracle-backed, no entry staler than r05) the r11 window is the PLAIN
# rotation output — no re-pins needed (no stored layout changed this
# round) and no insertions: exactly the queue the r10 verdict recorded.
VERIFY_PRIORITY: list[str] = [
    # r11 window: verbatim tools/rotate_window.py output against
    # CORRECTNESS_r10 (r10 verdict #2) — queue head is the six entries
    # the r10 tier-0a/0b insertions displaced (q_table_profile_orders,
    # q_orders_quality_rules, stream_events_sliding_rollup,
    # stream_scd1_upsert_priority, stream_events_content_digest,
    # scd2_point_in_time_join), then the 12-entry r05-stale tail, then
    # the stalest r06 greens in rotation order
    "scd2_point_in_time_join",
    "q_table_profile_orders",
    "q_orders_quality_rules",
    "stream_events_sliding_rollup",
    "stream_scd1_upsert_priority",
    "stream_events_content_digest",
    "stream_segment_bitmap_distinct",
    "text_quality_percentile_by_lang",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "text_gopher_quality_flags",
    "text_bigram_pmi",
    "dedup_exact_substring_spans",
    "dedup_bloom_blocklist",
    "dedup_eval_lsh_quality",
    "q_bloom_semijoin_pruning",
    "graph_pagerank_nation_trade",
    "graph_kcore_docs",
    "q_events_user_holt",
    "mm_payload_entropy",
    "q_salted_brand_revenue",
    "curriculum_length_shards",
    "sample_documents_temperature",
    "split_documents_kfold",
    "pipeline_user_rolling_features",
    "q_kanonymity_quasi_id",
    "q_dp_noisy_counts_by_nation",
    "emb_top_principal_component",
    "emb_remove_top_component",
    "q_multitouch_attribution",
    "q_user_activity_streaks",
    "q_item_cf_neighbors",
    "sim_label_centroid_distance",
    "sim_cosine_topk_vectorized",
    "sim_eval_recall_ivf_probe",
    "scd2_customer_priority_history",
    "scd1_current_customer_priority",
    "q_hll_distinct_users",
    "q_events_autocorrelation",
    "q_events_dow_seasonality",
    "q_chi_square_lang_source",
    "q_mutual_information_lang_source",
    "q_orders_benford_digits",
    "q_ab_welch_t",
    "q_revenue_bootstrap_ci",
    "q_survival_reorder_km",
    "stream_events_dedup_first_seen",
    "stream_segment_hourly_rollup",
    "stream_events_hll_distinct",
    "text_langid_confusion",
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
