"""Invariant tests for vec_pca_power (round-3 batch 7)."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _numpy_two_step_power(X: np.ndarray):
    """Replicate the operator's algorithm (not its limit): integer-
    quantized covariance, uniform start, two normalized matvecs,
    Rayleigh quotient."""
    scale = 1e12
    n, d = X.shape
    q = np.trunc(X * scale + np.sign(X) * 0.5)
    mu = (q.sum(axis=0) / scale) / n
    Cn = X - mu[None, :]
    prods = np.einsum("ni,nj->nij", Cn, Cn)
    qp = np.trunc(prods * scale + np.sign(prods) * 0.5)
    C = (qp.sum(axis=0) / scale) / (n - 1)
    v = np.full(d, 0.125)
    for _ in range(2):
        w = C @ v
        v = w / np.linalg.norm(w)
    lam = float(v @ C @ v)
    return v, lam, C


def test_pca_power_matches_numpy_replica(spark):
    rows = sorted(
        ent.queries()["vec_pca_power"](spark, SF_SMALL).collect(),
        key=lambda r: r.dim,
    )
    assert len(rows) == 64
    lam = rows[0].eigenvalue
    v = np.array([r.loading for r in rows])
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3  # unit norm
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    ref_v, ref_lam, C = _numpy_two_step_power(X)
    cos = abs(float(v @ ref_v))
    assert cos > 0.99999, cos
    assert abs(lam - ref_lam) < 1e-4
    # Rayleigh quotient of any unit vector lies inside the spectrum
    w = np.linalg.eigvalsh(C)
    assert w[0] - 1e-9 <= lam <= w[-1] + 1e-9
    # and two iterations must already beat the uniform-start quotient
    v0 = np.full(64, 0.125)
    v0 /= np.linalg.norm(v0)
    assert lam >= float(v0 @ C @ v0) - 1e-9


def test_pca_power_eigenvalue_consistent_across_rows(spark):
    rows = ent.queries()["vec_pca_power"](spark, SF_SMALL).collect()
    assert len({r.eigenvalue for r in rows}) == 1
    assert len({r.n_vecs for r in rows}) == 1
