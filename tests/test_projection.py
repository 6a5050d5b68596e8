"""The random projection must actually behave like a JL map: deterministic
across sessions, balanced signs, and (statistically) distance-preserving."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from csv_parquet_s3_spark.operators.projection import (
    PROJ_IN,
    PROJ_OUT,
    project,
    projection_matrix,
)
from csv_parquet_s3_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_matrix_is_deterministic_and_balanced(spark):
    m1 = sorted(map(tuple, projection_matrix(spark).collect()))
    m2 = sorted(map(tuple, projection_matrix(spark).collect()))
    assert m1 == m2
    assert len(m1) == PROJ_IN * PROJ_OUT
    signs = [s for _, _, s in m1]
    assert set(signs) == {-1, 1}
    # md5 parity should be near-balanced; a degenerate matrix (all same
    # sign) would collapse the projection onto one direction
    frac = signs.count(1) / len(signs)
    assert 0.35 < frac < 0.65, frac


def test_projection_preserves_pairwise_distances(spark):
    """JL property, statistically: every pairwise squared distance is
    preserved up to the k=16 concentration bound — the ratio d_proj/d_orig
    behaves like chi2_k/k (std ~ sqrt(2/k) = 0.35). On near-isotropic test
    embeddings all distances are similar, so rank CORRELATION is the wrong
    pin (the spread is smaller than the distortion); per-pair ratio
    concentration is the actual JL guarantee."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings").filter(
        F.col("vec_id") < 40
    )
    orig = {
        r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()
    }
    proj_rows = project(emb, projection_matrix(spark)).collect()
    proj: dict = {}
    for r in proj_rows:
        proj.setdefault(r.vec_id, {})[r.dim] = r.value
    sk = {v: np.array([d[j] for j in range(PROJ_OUT)]) for v, d in proj.items()}
    assert set(sk) == set(orig)

    ids = sorted(orig)
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d_orig = np.sum((orig[ids[a]] - orig[ids[b]]) ** 2)
            d_proj = np.sum((sk[ids[a]] - sk[ids[b]]) ** 2)
            ratios.append(d_proj / d_orig)
    ratios = np.array(ratios)
    assert 0.75 < ratios.mean() < 1.15, ratios.mean()
    frac_ok = np.mean((ratios > 0.4) & (ratios < 2.0))
    assert frac_ok >= 0.9, f"only {frac_ok:.2f} of pair distances within 2.5x"