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
# listed first. The r07 window resumes the standard rotation
# (tools/rotate_window.py against CORRECTNESS_r06) with two insertion
# groups per the window invariant and the changed-operator policy:
# (a) the six r07 registrations take same-round slots (never checked);
# (b) the eight entries whose CODE changed this round re-pin immediately —
#     the five leaderboard/segmentation queries rebuilt on the two-phase
#     distributed rank (plans/ranking.py; values identical, plan changed),
#     the late-data-drop entry (batch-count assertion added), and the two
#     refactored retrieval entries (shared scorer / shared ranker legs).
# Then the rotation output verbatim: rows-only sketches, the stalest r02
# greens (sim_cosine_topk_ivf_trained first — displaced twice), and the
# r02-green backlog, trimmed to the 50-slot window.
VERIFY_PRIORITY: list[str] = [
    # tier 0a: r07 registrations (never driver-checked)
    "retrieval_bm25_from_index",
    "retrieval_bm25_incremental",
    "retrieval_hybrid_rrf_topn",
    "dedup_minhash_batch_vs_index",
    "stream_click_purchase_left_outer",
    "stream_bm25_index_maintenance",
    # tier 0b: r07-changed operators re-pin
    "q_window_supplier_rank",
    "q_customer_value_deciles",
    "q_customer_rfm_segments",
    "q_customer_gini_concentration",
    "stream_events_late_data_drop",
    "q_model_gains_table",
    "retrieval_bm25_topk",
    "retrieval_hybrid_rrf",
    # tier 1: rows-only by nature (re-pin the weaker check)
    "q_approx_sketches",
    # tier 2: hash-greens, stalest first (rotate_window.py output)
    "sim_cosine_topk_ivf_trained",
    "text_token_counts",
    "text_doc_stats",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_lang_distribution",
    "text_langid_ngram",
    "text_feature_hash_embedding",
    "text_tfidf_top_terms",
    "q02_cheapest_supplier_per_part",
    "q07_nation_trade_volume",
    "q08_market_share",
    "q09_profit_by_nation_year",
    "q11_brand_value_concentration",
    "q12_priority_by_returnflag",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "q15_top_supplier",
    "q16_supplier_diversity",
    "q20_bulk_small_part_suppliers",
    "q21_last_shipper_counts",
    "q_asof_error_to_purchase",
    "q_range_join_price_bands",
    "q_order_value_quantiles",
    "q_grouping_sets_revenue",
    "q_kmv_distinct_users",
    "q_kmv_cohort_overlap",
    "dedup_exact_documents",
    "dedup_keep_first_events",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
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
