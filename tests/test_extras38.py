"""Invariant tests for batch 22 (elasticity, peaks, cosine histogram)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_elasticity_shows_ratio_bias(spark):
    rows = ent.queries()["sales_elasticity"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n >= 10
        assert -1e-9 <= r.r2 <= 1.0 + 1e-9
    # unit price = E/Q with E ⊥ Q ⇒ Pearson's spurious-ratio slope:
    # mechanically negative, clustered near -0.5 — the pitfall the
    # docstring documents
    mean_slope = sum(r.elasticity for r in rows) / len(rows)
    assert -0.9 < mean_slope < -0.1


def test_peaks_are_consistent(spark):
    rows = ent.queries()["ts_peaks"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_peaks >= 1
        assert r.max_peak >= 1
        assert r.top_peak_hr is not None


def test_cosine_histogram_isotropy(spark):
    rows = ent.queries()["vec_cosine_histogram"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_pairs for r in rows)
    assert total > 0
    for r in rows:
        assert -11 <= r.bucket <= 10
        # bucket consistent with its average member
        assert r.bucket <= r.avg_cos * 10 + 1e-6
        assert r.avg_cos * 10 < r.bucket + 1 + 1e-6
    # synthetic embeddings are near-isotropic: the mass centers near 0
    mean = sum(r.avg_cos * r.n_pairs for r in rows) / total
    assert abs(mean) < 0.3
