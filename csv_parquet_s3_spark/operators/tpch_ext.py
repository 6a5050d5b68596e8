"""Extended TPC-H-shaped relational surface (Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q14/
Q17/Q18/Q19/Q22 analogs adapted to the driver's star schema).

The reference implements no query operators at all (SURVEY.md §2.2 — its only
SQL is the purge script's COUNT/DELETE, `src/SQL/AutoPurge.sql:139-174`), so
this module exists purely for the driver-mandated analytics surface. Each
query adds a *distinct plan shape* beyond :mod:`relational`:

- correlated scalar aggregate joined back (Q17 avg-quantity, Q2 argmin);
- global-aggregate scalar subquery as a HAVING bound (Q11, Q22);
- conditional aggregation / pivoted CASE counts (Q8 share, Q12, Q14);
- double aggregation (Q13 distribution-of-counts);
- disjunctive multi-column predicates across a join (Q19);
- four-way snowflake with two independent nation legs (Q7).

Scale notes (100 TB design point): every scalar subquery is a one-row
aggregate → ``crossJoin(broadcast(...))``, never a driver collect; nation /
region / per-part averages broadcast when small, shuffle-join when not;
fact-fact joins stay equi-joins on natural keys so AQE can pick SMJ and
handle skew. Money math uses DECIMAL fragments shared with :mod:`relational`
so Spark and the DuckDB oracle compute textually identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.operators.relational import (
    DEC_PRICE,
    DEC_QTY,
    REVENUE,
    money_sum,
)
from csv_parquet_s3_spark.sources.tables import broadcast_if_small, load_table


# ---------------------------------------------------------------------------
# Q2 analog — argmin join-back: cheapest (unit-price) supplier per part.
# ---------------------------------------------------------------------------
@register(
    "q02_cheapest_supplier_per_part",
    oracle="""
    SELECT p_partkey, p_brand, s_name,
           CAST(ROUND(unit_price, 6) AS DOUBLE) AS unit_price
    FROM (
        SELECT l_partkey, l_suppkey,
               CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                               AS DOUBLE)
                          / SUM(l_quantity), 6) AS DOUBLE) AS unit_price,
               ROW_NUMBER() OVER (
                   PARTITION BY l_partkey
                   ORDER BY CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                                            AS DOUBLE)
                                       / SUM(l_quantity), 6) AS DOUBLE),
                            l_suppkey) AS rn
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ) u
    JOIN part ON part.p_partkey = u.l_partkey
    JOIN supplier ON s_suppkey = u.l_suppkey
    WHERE rn = 1 AND part.p_partkey <= 200
    """,
)
def q02_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part argmin: aggregate per (part, supplier), rank within part,
    keep rank 1 — the window-keep-first shape TPC-H Q2 needs (no partsupp
    table in this schema, so unit price from lineitem stands in for
    ps_supplycost)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.expr(
                f"CAST(ROUND(CAST(SUM({DEC_PRICE}) AS DOUBLE) / SUM(l_quantity), 6)"
                " AS DOUBLE)"
            ).alias("unit_price")
        )
    )
    w = W.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = unit.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & (F.col("l_partkey") <= 200)
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("unit_price", 6).cast("double").alias("unit_price"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 analog — directional trade volume between nation pairs by ship year.
# ---------------------------------------------------------------------------
@register(
    "q07_nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {money_sum('volume', 'revenue')}
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               YEAR(l_shipdate) AS l_year, {REVENUE} AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name < n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake with two independent nation legs (supplier vs customer side);
    nation legs broadcast unconditionally, the supplier leg size-gated
    (``broadcast_if_small`` — SF-scaling) — only the orders⋈lineitem join
    must shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    shipping = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            F.expr(REVENUE).alias("volume"),
        )
    )
    return shipping.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.expr("CAST(ROUND(SUM(volume), 2) AS DOUBLE)").alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q8 analog — one nation's market share of supply revenue by year.
# ---------------------------------------------------------------------------
_Q8_NATION = "NATION_3"


@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                                    THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END)
                           AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT YEAR(o_orderdate) AS o_year, {REVENUE} AS volume,
               n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
    ) all_sales
    GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: share = SUM(CASE WHEN nation)/SUM(all) per
    year — a single hash aggregate, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    all_sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.expr(REVENUE).alias("volume"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    national = F.expr(
        f"SUM(CASE WHEN supp_nation = '{_Q8_NATION}'"
        " THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END)"
    )
    return all_sales.groupBy("o_year").agg(
        F.round(
            national.cast("double") / F.sum("volume").cast("double"), 6
        )
        .cast("double")
        .alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 analog — profit by supplier nation and year (PROMO parts).
# ---------------------------------------------------------------------------
_Q9_AMOUNT = (
    f"{REVENUE} - CAST(0.5 AS DECIMAL(3,1)) * CAST(p_retailprice AS DECIMAL(12,2))"
    f" * {DEC_QTY}"
)


@register(
    "q09_profit_by_nation_year",
    oracle=f"""
    SELECT nation, o_year, {money_sum('amount', 'sum_profit')}
    FROM (
        SELECT n_name AS nation, YEAR(o_orderdate) AS o_year, {_Q9_AMOUNT} AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_type = 'PROMO'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q09_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way snowflake: part filter prunes the fact scan via the join
    (dynamic partition-style filtering at scale); retail-cost proxy replaces
    the missing partsupp.ps_supplycost."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(broadcast_if_small(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            F.expr(_Q9_AMOUNT).alias("amount"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        F.expr("CAST(ROUND(SUM(amount), 2) AS DOUBLE)").alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# Q11 analog — brands holding an outsized share of total line value.
# ---------------------------------------------------------------------------
@register(
    "q11_brand_value_concentration",
    oracle=f"""
    SELECT p_brand, {money_sum(DEC_PRICE, 'brand_value')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY p_brand
    HAVING CAST(SUM({DEC_PRICE}) AS DOUBLE) >
           0.02 * (SELECT CAST(SUM({DEC_PRICE}) AS DOUBLE) FROM lineitem)
    """,
)
def q11_brand_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-total scalar subquery as a HAVING bound: the one-row global
    aggregate is cross-joined broadcast — no driver collect, no second pass
    over the grouped data."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_brand = (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.expr(f"SUM({DEC_PRICE})").alias("_sum"))
    )
    total = li.agg(F.expr(f"CAST(SUM({DEC_PRICE}) AS DOUBLE)").alias("_total"))
    return (
        per_brand.crossJoin(F.broadcast(total))
        .filter(F.col("_sum").cast("double") > 0.02 * F.col("_total"))
        .select(
            "p_brand",
            F.expr("CAST(ROUND(_sum, 2) AS DOUBLE)").alias("brand_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 analog — late-shipment priority counts by return flag.
# ---------------------------------------------------------------------------
@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted CASE counts over a fact-fact join with a cross-table predicate
    (ship after order date) — the predicate is join-level, not pushable,
    exactly Q12's shape."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 analog — distribution of orders-per-customer.
# ---------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double aggregation: per-customer count, then distribution of counts.
    LEFT join keeps zero-order customers (COUNT of a null column is 0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 analog — PROMO revenue share by ship year.
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT YEAR(l_shipdate) AS l_year,
           CAST(ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                            THEN {REVENUE}
                                            ELSE CAST(0 AS DECIMAL(12,2)) END)
                              AS DOUBLE)
                      / CAST(SUM({REVENUE}) AS DOUBLE), 6) AS DOUBLE)
             AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY YEAR(l_shipdate)
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation ratio (promo vs all revenue) — one aggregate,
    broadcast dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.expr(
        f"SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE}"
        " ELSE CAST(0 AS DECIMAL(12,2)) END)"
    )
    return (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double")
                / F.expr(f"SUM({REVENUE})").cast("double"),
                6,
            )
            .cast("double")
            .alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q17 analog — revenue from small-quantity lines vs per-part average.
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey AS pa_key,
               CAST(SUM({DEC_QTY}) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand, {money_sum(DEC_PRICE, 'small_qty_revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pa_key = l_partkey
    WHERE l_quantity < 0.5 * avg_qty
    GROUP BY p_brand
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-group average joined back to the fact (TPC-H Q17 shape):
    the per-part aggregate is tiny relative to the fact → size-gated
    broadcast (|part| rows — scales with SF, so the hint needs the gate);
    decimal sum/count keeps the average order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.expr(f"CAST(SUM({DEC_QTY}) AS DOUBLE)") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(broadcast_if_small(part_avg, sf_dir, "part"), li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.expr(f"CAST(ROUND(SUM({DEC_PRICE}), 2) AS DOUBLE)").alias(
                "small_qty_revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 analog — large-volume orders (HAVING over a fact aggregate).
# ---------------------------------------------------------------------------
_Q18_MIN_QTY = 250


@register(
    "q18_large_volume_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(ROUND(sum_qty, 2) AS DOUBLE) AS sum_qty
    FROM (
        SELECT l_orderkey, SUM({DEC_QTY}) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM({DEC_QTY}) > {_Q18_MIN_QTY}
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-join: the HAVING filter shrinks the fact aggregate
    *before* it joins orders/customer — at scale the selective side drives
    the join, not the other way around."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(f"SUM({DEC_QTY})").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.expr("CAST(ROUND(sum_qty, 2) AS DOUBLE)").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 analog — disjunctive multi-column predicates across a join.
# ---------------------------------------------------------------------------
_Q19_PRED = """
    (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
    OR (p_type = 'PROMO' AND l_quantity >= 40)
"""


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT l_returnflag, {money_sum(REVENUE, 'revenue')}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_PRED}
    GROUP BY l_returnflag
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate spanning both join sides (Q19's signature shape);
    Catalyst still pushes the single-side conjuncts it can derive."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .filter(F.expr(_Q19_PRED))
        .groupBy("l_returnflag")
        .agg(
            F.expr(f"CAST(ROUND(SUM({REVENUE}), 2) AS DOUBLE)").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 analog — rich customers with no open orders, by nation.
# ---------------------------------------------------------------------------
@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                 AS threshold
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold (broadcast one-row aggregate) + anti join
    (NOT EXISTS) + aggregation — Q22's three-operator sandwich."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)")
            / F.count("*")
        ).alias("threshold")
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(
                "CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)"
            ).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 analog — top supplier(s) by revenue (scalar MAX over an aggregate).
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
        SELECT l_suppkey, SUM({REVENUE}) AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM srev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax via scalar subquery: the MAX of the per-supplier aggregate is a
    one-row broadcast; DECIMAL revenue makes the equality exact (a double
    sum could never safely '=' across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(F.expr(f"SUM({REVENUE})").alias("total_rev"))
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.expr("CAST(ROUND(total_rev, 2) AS DOUBLE)").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 analog — supplier diversity per part attribute, NOT IN exclusion.
# ---------------------------------------------------------------------------
@register(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN as a left-anti join against the exclusion set (size-gated
    broadcast — it is a subset of the SF-scaling supplier table), then a
    distinct-count aggregate per part attribute triple."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(broadcast_if_small(excluded, sf_dir, "supplier"), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 analog — suppliers moving large volumes of SMALL parts (semi-join on
# an aggregated HAVING subquery).
# ---------------------------------------------------------------------------
@register(
    "q20_bulk_small_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'SMALL'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100.0
    )
    """,
)
def q20_bulk_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over an aggregate with HAVING → aggregate first, then a
    left-semi join; the qualifying-supplier set shrinks before it touches
    the supplier table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    supp = load_table(spark, sf_dir, "supplier")
    qualifying = (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100.0)
    )
    return supp.join(
        qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))


# ---------------------------------------------------------------------------
# Q21 analog — last shipper of multi-supplier orders.
# ---------------------------------------------------------------------------
@register(
    "q21_last_shipper_counts",
    oracle="""
    WITH order_supp AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    multi AS (
        SELECT l_orderkey, MAX(last_ship) AS order_last
        FROM order_supp GROUP BY l_orderkey
        HAVING COUNT(*) >= 2
    )
    SELECT s_name, COUNT(*) AS n_orders_last_shipper
    FROM order_supp os
    JOIN multi m ON os.l_orderkey = m.l_orderkey
                AND os.last_ship = m.order_last
    JOIN supplier ON s_suppkey = os.l_suppkey
    GROUP BY s_name
    """,
)
def q21_last_shipper_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's shape without correlated NOT EXISTS: per-(order, supplier)
    aggregate, keep multi-supplier orders, credit the supplier(s) whose last
    shipment closes the order. Two aggregations + one equi-join, all keyed
    on l_orderkey — one partitioning reused across stages."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    order_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    multi = (
        order_supp.groupBy("l_orderkey")
        .agg(F.max("last_ship").alias("order_last"), F.count("*").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .drop("n_supp")
    )
    return (
        order_supp.join(multi, "l_orderkey")
        .filter(F.col("last_ship") == F.col("order_last"))
        .join(broadcast_if_small(supp, sf_dir, "supplier"), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_orders_last_shipper"))
    )
