"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join handling (enabled in session.py) covers most cases by
splitting oversized partitions at runtime; explicit salting is the manual
fallback when a single key is so hot that even a split partition overwhelms
one task — the classic 100 TB failure mode.

Mechanics: every row of the large side gets a deterministic salt in
``[0, buckets)`` derived from the full row (so rows *within* a hot key
spread across buckets); the small side is replicated once per bucket; the
join key becomes ``(key, salt)``, fanning one hot key's work out over
``buckets`` tasks. Result set is identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Deterministic per-row salt: hash of the whole row, mod buckets."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def replicate_for_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Small side: one copy per salt bucket (buckets× size — keep it small)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>"))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the large side's hot keys salted across ``buckets`` tasks.

    ``on`` must name join column(s) present in both sides (they merge, as in
    a plain name-join). Produces exactly the rows of ``large.join(small, on,
    how)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    left = with_salt(large, buckets)
    right = replicate_for_salt(small, buckets)
    return left.join(right, keys + [SALT_COL], how).drop(SALT_COL)
