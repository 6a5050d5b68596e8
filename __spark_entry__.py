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
# listed first. The r06 window is the catch-up round the r05 verdict demanded
# (demand #1): verbatim `tools/rotate_window.py` output — all 46 entries that
# have NEVER received a driver CORRECTNESS row (tokenizer, privacy, 11
# statistics entries, k-core, PageRank, SCD1/SCD2 history, RRF, bigram
# perplexity, Holt, kfold, temperature sampling, streaks, item-CF, Gini,
# PCA/ABTT, ...), then the rows-only `q_approx_sketches`, then the 3 stalest
# hash-greens (r02). Registrations were FROZEN this round per the same
# demand, so after this window every registry entry has ≥1 driver row.
VERIFY_PRIORITY: list[str] = [
    # tier 0: never driver-checked (46 entries)
    "q_customer_gini_concentration",
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
    "sim_eval_recall_ivf_probe",
    "retrieval_hybrid_rrf",
    "scd2_customer_priority_history",
    "scd1_current_customer_priority",
    "q_hll_distinct_users",
    "q_events_autocorrelation",
    "q_events_dow_seasonality",
    "q_chi_square_lang_source",
    "q_mutual_information_lang_source",
    "q_orders_benford_digits",
    "q_customer_rfm_segments",
    "q_ab_welch_t",
    "q_revenue_bootstrap_ci",
    "q_survival_reorder_km",
    "q_model_gains_table",
    "stream_events_dedup_first_seen",
    "stream_segment_hourly_rollup",
    "stream_events_hll_distinct",
    "text_langid_confusion",
    "text_zipf_fit",
    "text_bigram_perplexity",
    "text_chunk_documents",
    "text_rake_keywords",
    "text_bpe_learn_merges",
    "text_bpe_apply_merges",
    # the one r06 registration (verdict stretch #8): late-data watermark
    # correctness — takes its first driver row immediately so the
    # every-entry-has-a-row invariant survives the addition
    "stream_events_late_data_drop",
    # tier 1: rows-only by nature (re-pin the weaker check)
    "q_approx_sketches",
    # tier 2: stalest hash-greens (r02) rotate back; ivf_trained (also r02
    # green) was displaced by the late-data entry and re-pins r07
    "sim_label_centroid_distance",
    "sim_cosine_topk_vectorized",
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
