"""Slowly-changing-dimension (SCD type 2) materialization.

The reference's warehouse side (AutoPurge.sql) manages dimension tables by
deleting aged rows; the modern counterpart a Spark warehouse needs is the
inverse — *versioning* dimension attributes over time. This module derives
an SCD2 history (valid_from / valid_to / is_current version rows) from an
ordered change feed with plain window functions: a gaps-and-islands pass
(lag ≠ current ⇒ new version) followed by per-version aggregation and a
lead() to close each interval.

Scale shape: everything partitions by the dimension key — one shuffle on
c_custkey, window + aggregate inside the partition, no collect, no UDF. At
100 TB the change feed shuffles once and each key's history (bounded by its
change count, not the corpus) folds locally; AQE handles hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse an ordered change feed (one row per observation) into SCD2
    version rows: consecutive observations with the same ``attr`` merge
    into one version; a change opens a new one. ``tiebreak`` makes the
    ordering total when two observations share a timestamp."""
    wo = W.partitionBy(key).orderBy(ts, tiebreak)
    runs = changes.select(
        key,
        attr,
        ts,
        tiebreak,
        F.when(
            F.lag(attr).over(wo).isNull() | (F.lag(attr).over(wo) != F.col(attr)),
            1,
        )
        .otherwise(0)
        .alias("new_version"),
    ).withColumn(
        "version",
        F.sum("new_version").over(
            wo.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    versions = runs.groupBy(key, "version").agg(
        F.first(attr).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count("*").alias("n_observations"),
    )
    wv = W.partitionBy(key).orderBy("version")
    return versions.select(
        key,
        F.col("version").cast("bigint").alias("version"),
        attr,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_observations",
    )


@register(
    "scd2_customer_priority_history",
    oracle="""
    WITH runs AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               CASE WHEN lag(o_orderpriority) OVER w IS NULL
                         OR lag(o_orderpriority) OVER w <> o_orderpriority
                    THEN 1 ELSE 0 END AS new_version
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    numbered AS (
        SELECT o_custkey, o_orderpriority, o_orderdate,
               SUM(new_version) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS version
        FROM runs
    ),
    versions AS (
        SELECT o_custkey, CAST(version AS BIGINT) AS version,
               MIN(o_orderpriority) AS o_orderpriority,
               MIN(o_orderdate) AS valid_from,
               COUNT(*) AS n_observations
        FROM numbered
        GROUP BY o_custkey, version
    )
    SELECT o_custkey, version, o_orderpriority, valid_from,
           lead(valid_from) OVER wv AS valid_to,
           lead(valid_from) OVER wv IS NULL AS is_current,
           n_observations
    FROM versions
    WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
    """,
)
def scd2_customer_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order priority, derived from the
    orders feed: consecutive orders with the same priority collapse into a
    version; a priority change closes the prior version (valid_to = next
    version's valid_from) and opens a new one, latest version flagged
    is_current. The gaps-and-islands + lead() formulation a dimension
    pipeline materializes after every CDC batch.

    The oracle replays the identical window SQL; within a run the attr is
    constant so MIN(o_orderpriority) == first — both engines agree without
    an ORDER BY inside an aggregate.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return scd2_from_changes(
        orders,
        key="o_custkey",
        attr="o_orderpriority",
        ts="o_orderdate",
        tiebreak="o_orderkey",
    )


@register(
    "scd1_current_customer_priority",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderpriority, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
               COUNT(*) OVER (PARTITION BY o_custkey) AS n_changes
        FROM orders
    )
    SELECT c.c_custkey,
           COALESCE(r.o_orderpriority, 'NONE') AS current_priority,
           r.o_orderdate AS last_change,
           CAST(COALESCE(r.n_changes, 0) AS BIGINT) AS n_changes
    FROM customer c
    LEFT JOIN ranked r ON r.o_custkey = c.c_custkey AND r.rn = 1
    """,
)
def scd1_current_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type 1 (latest-wins upsert): the current-state dimension the SCD2
    history above collapses to. One window pass picks each key's newest
    observation (total order via the o_orderkey tiebreak), then a left join
    merges it over the base dimension — the batch equivalent of
    ``MERGE INTO dim USING changes WHEN MATCHED THEN UPDATE`` for engines
    without MERGE. Keys with no feed rows keep their default.

    Scale shape: one shuffle on the dimension key for the window, one
    key-partitioned join; the feed never re-sorts globally. At 100 TB the
    window's per-key state is one row (rn=1 short-circuits via the
    rank-pushdown filter), and AQE splits hot customer keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    wk = W.partitionBy("o_custkey")
    ranked = (
        orders.select(
            "o_custkey",
            "o_orderpriority",
            "o_orderdate",
            F.row_number()
            .over(wk.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey")))
            .alias("rn"),
            F.count("*").over(wk).alias("n_changes"),
        )
        .filter(F.col("rn") == 1)
    )
    return cust.join(ranked, cust.c_custkey == ranked.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("o_orderpriority", F.lit("NONE")).alias("current_priority"),
        F.col("o_orderdate").alias("last_change"),
        F.coalesce("n_changes", F.lit(0)).cast("bigint").alias("n_changes"),
    )


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH runs AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               CASE WHEN lag(o_orderpriority) OVER w IS NULL
                         OR lag(o_orderpriority) OVER w <> o_orderpriority
                    THEN 1 ELSE 0 END AS new_version
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    numbered AS (
        SELECT o_custkey, o_orderpriority, o_orderdate,
               SUM(new_version) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS version
        FROM runs
    ),
    versions AS (
        SELECT o_custkey, version,
               MIN(o_orderpriority) AS o_orderpriority,
               MIN(o_orderdate) AS valid_from
        FROM numbered GROUP BY o_custkey, version
    ),
    hist AS (
        SELECT o_custkey, version, o_orderpriority, valid_from,
               lead(valid_from) OVER (PARTITION BY o_custkey
                                      ORDER BY version) AS valid_to
        FROM versions
    ),
    fact AS (
        SELECT o.o_custkey AS custkey, l.l_shipdate AS ship,
               CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - CAST(l_discount AS DECIMAL(4,2))
                          AS DECIMAL(4,2)) AS rev
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    pit AS (
        SELECT h.o_orderpriority AS priority_at_ship, f.ship, f.rev
        FROM fact f LEFT JOIN hist h
          ON h.o_custkey = f.custkey
         AND h.valid_from <= f.ship
         AND (h.valid_to IS NULL OR f.ship < h.valid_to)
    )
    SELECT priority_at_ship,
           CAST(EXTRACT(year FROM ship) AS INT) AS ship_year,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
    FROM pit GROUP BY priority_at_ship, ship_year
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each lineitem is priced against the
    customer-priority SCD2 version EFFECTIVE ON ITS SHIP DATE — the
    time-travel-correct dimension lookup that feature stores call PIT
    correctness and Kimball calls a type-2 surrogate lookup. Joining the
    current dimension instead silently rewrites history; this is the
    leakage the operator exists to prevent.

    The oracle states the semantics as the textbook non-equi range join
    (valid_from <= ship < valid_to). The Spark plan computes the SAME match
    without a range join: version-open rows and fact probes UNION into one
    stream keyed by customer, one window sorted by (date, row-kind,
    version) carries the last-opened version onto each probe (as-of trick —
    versions tile the timeline, so last-open == containing). One shuffle on
    o_custkey, no BroadcastNestedLoopJoin at any scale; equal-valid_from
    (zero-width) versions order by version number so the later one wins,
    matching the oracle's empty-interval exclusion. Facts that predate the
    key's first version keep a NULL attribute (LEFT semantics) — this
    corpus ships some lineitems before their customer's first order date,
    and inventing a later version for them would be exactly the
    look-ahead leakage the operator exists to prevent.

    Cites the reference's warehouse role (AutoPurge.sql manages dim tables
    by age); PIT lookup is the query-side counterpart its users run."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hist = scd2_from_changes(
        orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"),
        key="o_custkey",
        attr="o_orderpriority",
        ts="o_orderdate",
        tiebreak="o_orderkey",
    )
    fact = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        F.col("o_custkey").alias("key"),
        F.col("l_shipdate").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("version"),
        F.lit(None).cast("string").alias("attr"),
        F.expr(
            "CAST(l_extendedprice AS DECIMAL(12,2))"
            " * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"
        ).alias("rev"),
    )
    vrows = hist.select(
        F.col("o_custkey").alias("key"),
        F.col("valid_from").alias("t"),
        F.lit(0).alias("kind"),
        "version",
        F.col("o_orderpriority").alias("attr"),
        F.lit(None).cast("decimal(17,4)").alias("rev"),
    )
    w = W.partitionBy("key").orderBy(
        "t", "kind", F.col("version").asc_nulls_last()
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    pit = (
        vrows.unionByName(fact)
        .withColumn("priority_at_ship", F.last("attr", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
    )
    return pit.groupBy(
        "priority_at_ship",
        F.year("t").cast("int").alias("ship_year"),
    ).agg(
        F.count("*").alias("n_items"),
        F.expr("CAST(ROUND(SUM(rev), 2) AS DOUBLE)").alias("revenue"),
    )


@register(
    "q_snapshot_diff_orders",
    oracle="""
    WITH old_s AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0
                    THEN o_totalprice + CAST(1.00 AS DECIMAL(4,2))
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 10 <> 3
    ),
    new_s AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 13 <> 5
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.o_totalprice AS old_totalprice,
           n.o_totalprice AS new_totalprice
    FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
       OR o.o_orderstatus <> n.o_orderstatus
    """,
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — DERIVE a change feed (insert/update/delete rows)
    from two full table snapshots, the inverse of the CDC-apply operators
    (`stream_scd1_upsert_priority` consumes a feed; this produces one).
    The everyday shape: a source system only hands you nightly full dumps,
    and downstream SCD/incremental-rollup maintenance needs deltas.

    The two snapshots are derived deterministically from ``orders`` so the
    oracle can replay them: the "old" snapshot is missing the
    ``% 10 = 3`` keys (those surface as inserts) and carries a +1.00
    totalprice perturbation on the ``% 7 = 0`` keys (updates); the "new"
    snapshot is missing the ``% 13 = 5`` keys (deletes). Classification is
    one FULL OUTER join on the key; unchanged rows (the overwhelming
    majority in production) are filtered out before anything downstream.

    Scale shape: a single key-partitioned full-outer join — with both
    snapshots bucketed by key (sources/bucketed.py) it is shuffle-free;
    change detection is a column compare (for wide tables, compare a
    persisted per-row digest column instead — `q_table_content_digest`'s
    row hash is the building block). No collect, no UDF, no skew risk
    beyond the join key itself (primary key — unique)."""
    orders = load_table(spark, sf_dir, "orders")
    old_s = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.expr("o_totalprice + CAST(1.00 AS DECIMAL(4,2))"),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    new_s = orders.filter(F.col("o_orderkey") % 13 != 5).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    o, n = old_s.alias("o"), new_s.alias("n")
    j = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    return j.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
        | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
    ).select(
        F.coalesce("o.o_orderkey", "n.o_orderkey").alias("o_orderkey"),
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("o.o_totalprice").alias("old_totalprice"),
        F.col("n.o_totalprice").alias("new_totalprice"),
    )
