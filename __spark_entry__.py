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
# listed first. After the r11 window (50/50 hash-green, registry 236/236
# oracle-backed, no entry staler than r06) the r12 window is the rotation
# output PLUS re-pins at the head for the queries whose physical plans
# changed this round (the broadcast-gate fix, r11 verdict #1).
VERIFY_PRIORITY: list[str] = [
    # r12 window: RE-PINS FIRST — the 14 queries whose plans changed
    # this round: dedup_canonical_docs (survivorship pick+assignment
    # fused into one cluster-partitioned window pass, late r12; the
    # displaced tail entry dedup_simhash_hamming_pairs is hash-green
    # r08, inside the r13 staleness target),
    # text_bigram_kn_perplexity (ctx+fanout fused into one
    # w1-keyed aggregate) and text_repetition_ratio (map-only rewrite,
    # shuffle removed), then the 11 queries whose join plans changed
    # (forced F.broadcast hints on SF-scaling part/supplier/part_avg
    # replaced by the size-gated sources.tables.broadcast_if_small;
    # r11 verdict #1) — all need fresh driver hash rows against the
    # new plans. Then the verbatim tools/rotate_window.py output
    # against CORRECTNESS_r11 in its printed order (queue head = the
    # five r06-stale text entries, Zipf/chunk/RAKE/BPE-learn/
    # BPE-apply), minus the 10 changed queries it already contained;
    # displaced tail entries: mm_frame_samples (hash-green r10), and
    # for the two textstats re-pins dedup_cluster_components +
    # mm_payload_stats (both hash-green r08 — still inside the r13
    # staleness target).
    "dedup_canonical_docs",
    "text_bigram_kn_perplexity",
    "text_repetition_ratio",
    "q07_nation_trade_volume",
    "q08_market_share",
    "q09_profit_by_nation_year",
    "q11_brand_value_concentration",
    "q14_promo_revenue_share",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_bulk_small_part_suppliers",
    "q21_last_shipper_counts",
    "graph_pagerank_nation_trade",
    "text_zipf_fit",
    "text_chunk_documents",
    "text_rake_keywords",
    "text_bpe_learn_merges",
    "text_bpe_apply_merges",
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
    "dedup_minhash_batch_vs_index",
    "retrieval_hybrid_rrf",
    "retrieval_hybrid_rrf_topn",
    "retrieval_bm25_topk",
    "stream_events_late_data_drop",
    "text_token_counts",
    "text_doc_stats",
    "text_langid_heuristic",
    "text_fingerprint",
    "text_lang_distribution",
    "text_langid_ngram",
    "text_feature_hash_embedding",
    "text_tfidf_top_terms",
    "q02_cheapest_supplier_per_part",
    "q12_priority_by_returnflag",
    "q13_order_count_distribution",
    "q18_large_volume_orders",
    "q22_idle_rich_customers",
    "q15_top_supplier",
    "q_customer_gini_concentration",
    "dedup_simhash_buckets",
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
