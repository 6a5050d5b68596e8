"""Query registry shared by all operator modules.

Each operator registers a ``(spark, sf_dir) -> DataFrame`` callable plus, when
the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle SQL. The
driver (``__spark_entry__.py``) runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in the Spark plan and the SQL;
- monetary aggregates are computed in DECIMAL (exact, order-independent) and
  only cast to DOUBLE at the very end, so Spark's and DuckDB's different
  accumulation orders cannot produce differing doubles;
- every LIMIT query carries a total tie-breaking ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry (optionally with oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
