"""Outer joins, lead/ntile windows, and JSON column functions — the
remaining rows of the SURVEY §2.2 operator taxonomy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.operators.relational import DEC_TOTALPRICE, money_sum
from csv_parquet_s3_spark.sources.tables import load_table


@register(
    "q_left_join_customer_order_counts",
    oracle=f"""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           {money_sum(f'COALESCE({DEC_TOTALPRICE}, 0)', 'total_spent')}
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_left_join_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every customer appears, order-less ones with 0/0.00."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr(money_sum(f"COALESCE({DEC_TOTALPRICE}, 0)", "total_spent")),
        )
    )


@register(
    "q_full_outer_nation_presence",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey),
    c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey)
    SELECT COALESCE(s.nk, c.nk) AS nationkey,
           COALESCE(n_suppliers, CAST(0 AS BIGINT)) AS n_suppliers,
           COALESCE(n_customers, CAST(0 AS BIGINT)) AS n_customers
    FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
)
def q_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations present on either side, zero-filled."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    return (
        supp.join(cust, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_suppliers", F.lit(0).cast("bigint")).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0).cast("bigint")).alias("n_customers"),
        )
    )


@register(
    "q_window_lead_ntile",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(datediff('day', o_orderdate,
                LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)) AS INT)
             AS days_to_next_order,
           NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS spend_quartile
    FROM orders
    """,
)
def q_window_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD (inter-order gap) + NTILE (per-customer spend quartile)."""
    orders = load_table(spark, sf_dir, "orders")
    w_time = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_spend = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.lead("o_orderdate").over(w_time), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_next_order"),
        F.ntile(4).over(w_spend).alias("spend_quartile"),
    )


@register(
    "q_events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k,
           CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column functions over the semi-structured ``props`` payload."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') as int)")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_high_k"),
        F.max(k).cast("int").alias("max_k"),
    )
