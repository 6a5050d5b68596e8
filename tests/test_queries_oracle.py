"""Differential test: every registered query with an oracle must match DuckDB
at the smoke scale factor — the local mirror of the driver's t2 check."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
from tests.oracle_compare import compare


def _cases():
    from csv_parquet_s3_spark.operators import ORACLES, QUERIES

    return [(name, QUERIES[name], ORACLES.get(name)) for name in sorted(QUERIES)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    df = fn(spark, SF_CORRECTNESS)
    if oracle is None:
        # rows-only check, mirroring the driver's weaker path
        n = df.count()
        assert n >= 0
        return
    rel = duck.sql(oracle)
    ok, msg = compare(df, rel)
    assert ok, f"{name}: {msg}"
    # 0-row agreement is a trivial (vacuous) match — every oracle query must
    # exercise real rows at the DEFAULT test SF, or the check proves nothing.
    # At other SFs (diagnostic sweeps via SPARK_GRAFT_TEST_SF) a selective
    # query may legitimately return nothing (e.g. the spike detector finds
    # no spikes on 10× smoother data), so only value agreement is asserted.
    import os

    if not os.environ.get("SPARK_GRAFT_TEST_SF"):
        assert len(rel.df()) > 0, f"{name}: oracle returns 0 rows — vacuous check"
