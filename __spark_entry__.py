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
# listed first. The r09 window = tools/rotate_window.py output against
# CORRECTNESS_r01..r08 with the r08-verdict-ordered insertions:
# (0a) the FIVE r08 closing-wave registrations that landed after the r08
#      window filled (never driver-checked; locally 3-SF hash-green);
# (0b) the THREE r03-stale greens the r08 verdict-demanded registrations
#      displaced (rotation fronts them too);
# (0c) FOUR re-pins for the stored-index serving entries whose PLANS
#      changed in the r08 closing wave after that window was locked —
#      and changed again in r09 (format-4 directory-per-list layout +
#      collect-free DPP serving), so these slots earn their keep twice;
# then the rows-only sketches and the stalest greens from the rotation
# output verbatim, trimmed to the 50-slot window (the four entries the
# 0c re-pins displace move to the r10 queue).
VERIFY_PRIORITY: list[str] = [
    # tier 0a: r08 closing-wave registrations (never driver-checked)
    "sim_cosine_topk_ivf_incremental",
    "sim_cosine_topk_ivf_after_delete",
    "stream_ivf_index_maintenance",
    "q_snapshot_diff_orders",
    "graph_label_propagation",
    # tier 0b: the three stale greens displaced by r08's registrations
    "text_repetition_ratio",
    "text_benchmark_contamination",
    "pii_redact_customers",
    # tier 0c: layout-v3 serving re-pins (plans changed post-window in r08)
    "sim_cosine_topk_ivf_pq_from_index",
    "sim_cosine_topk_ivf_sq8_from_index",
    "sim_cosine_topk_ivf_pq_refine",
    "sim_cosine_topk_ivf_trained",
    # rotation output: rows-only sketches, then stalest greens (r04 tail)
    "q_approx_sketches",
    "text_bpe_token_stats",
    "dedup_canonical_docs",
    "q_events_user_ewma",
    "dedup_minhash_incremental",
    "mm_byte_histogram_features",
    "q_events_sessionize",
    "q_events_user_daily_activity",
    "q_events_funnel",
    "q_left_join_customer_order_counts",
    "q_full_outer_nation_presence",
    "q_window_lead_ntile",
    "q_events_json_extract",
    "pack_documents_greedy",
    "pack_documents_efficiency",
    "pack_documents_consolidated",
    "split_documents_train_test",
    "sample_documents_stratified",
    "sample_documents_quality_weighted",
    "rebalance_documents_by_lang",
    "emb_random_projection",
    "q_events_trailing_hour",
    "q_unpivot_lineitem_metrics",
    "q_null_safe_join",
    "q_window_value_functions",
    "q_string_agg_statuses",
    "q_events_hourly_gapfill",
    "q_events_weekly_retention",
    "q_order_value_histogram",
    "q_revenue_month_over_month",
    "q_supplier_balance_zscore",
    "q_priority_share_of_total",
    "q_part_size_price_correlation",
    "q_events_dau_wau_stickiness",
    "q_customer_reorder_gaps",
    "q_user_journey_paths",
    "q_supplier_balance_mad",
    "q_events_error_spikes",
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
