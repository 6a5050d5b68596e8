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
# queries(), so each round the entries still lacking a green driver row are
# listed first. Round 1 verified 50 queries (CORRECTNESS_r01.json); round 2
# front-loads the 46 entries that fell outside that window, the repaired
# mm_byte_histogram_features, the newly oracle-backed q_events_user_ewma,
# and the two new index-lifecycle queries.
VERIFY_PRIORITY: list[str] = [
    # tpch_ext (16) — unchecked in r01
    "q02_cheapest_supplier_per_part",
    "q07_nation_trade_volume",
    "q08_market_share",
    "q09_profit_by_nation_year",
    "q11_brand_value_concentration",
    "q12_priority_by_returnflag",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q20_bulk_small_part_suppliers",
    "q21_last_shipper_counts",
    "q22_idle_rich_customers",
    # similarity (5) — unchecked in r01
    "sim_cosine_topk_bruteforce",
    "sim_cosine_topk_ivf_label",
    "sim_cosine_topk_ivf_probe",
    "sim_label_centroid_distance",
    "sim_cosine_topk_vectorized",
    # textstats (8) — unchecked in r01
    "text_token_counts",
    "text_doc_stats",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_lang_distribution",
    "text_langid_ngram",
    "text_feature_hash_embedding",
    "text_tfidf_top_terms",
    # reshape (15 of 18) — unchecked in r01
    "q_window_value_functions",
    "q_string_agg_statuses",
    "q_events_hourly_gapfill",
    "q_events_weekly_retention",
    "q_order_value_histogram",
    "q_revenue_month_over_month",
    "q_supplier_balance_zscore",
    "q_priority_share_of_total",
    "q_part_size_price_correlation",
    "q_customer_value_deciles",
    "q_events_dau_wau_stickiness",
    "q_customer_reorder_gaps",
    "q_user_journey_paths",
    "q_supplier_balance_mad",
    "q_events_error_spikes",
    # sampling (2) — unchecked in r01
    "split_documents_train_test",
    "sample_documents_stratified",
    # repaired / upgraded / new this round (4)
    "mm_byte_histogram_features",
    "q_events_user_ewma",
    "sim_cosine_topk_ivf_trained",
    "dedup_minhash_incremental",
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
