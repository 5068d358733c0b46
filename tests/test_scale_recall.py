"""ANN / IVF recall asserted at TWO corpus scales (VERDICT r7 item 8).

The sf0.1 recall tests alone cannot show that bucketing quality holds
as the corpus grows; these re-assert the same better-than-chance
ratio on the 10× disjoint-replica probe corpus (built by
tools/scale_probe.py and cached under artifacts/scale_probe_data/x10).
Skips cleanly when the probe corpus hasn't been built — the per-round
scale probe builds it, so CI-after-probe always exercises both rows.

Chance = the scanned corpus fraction (a random candidate set of the
same size would hit that recall in expectation); both approximate
paths must beat it by 1.5× at every scale. The corpus is near-uniform
(true neighbors at cos≈0.45, barely above random), so absolute recall
is low by nature — the RATIO is the scale-invariant property.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as ent
from etl_framework_spark.catalog import table

SF_MID = "/root/testdata/sf0.01"
X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "scale_probe_data", "x10",
)
_SCALES = [SF_MID] + (
    [X10] if os.path.exists(os.path.join(X10, ".complete")) else []
)


def _exact_pairs(spark, sf):
    return {
        (r.qid, r.vid)
        for r in ent.queries()["llm_sim_topk"](spark, sf).collect()
    }


@pytest.mark.parametrize("sf", _SCALES)
def test_ann_recall_ratio_holds_at_scale(spark, sf):
    from etl_framework_spark.operators.similarity import ann_params

    exact = _exact_pairs(spark, sf)
    ann = {
        (r.qid, r.vid)
        for r in ent.queries()["llm_sim_ann"](spark, sf).collect()
    }
    recall = len(exact & ann) / len(exact)
    n = table(spark, sf, "embeddings").count()
    p, n_buckets = ann_params(n)
    scan_fraction = (p + 1) / n_buckets  # own bucket + P Hamming-1 probes
    assert recall > 1.5 * scan_fraction, (sf, recall, scan_fraction)


@pytest.mark.parametrize("sf", _SCALES)
def test_ivf_recall_ratio_holds_at_scale(spark, sf):
    """Chance = the MEASURED candidate fraction (r9): cells are
    unevenly sized and the query's own cell usually overlaps its
    top-NPROBE centroids, so assuming NPROBE+1 full cells overstates
    the scan by ~30% — ivf_topk's _return_candidates hook exposes the
    real pre-ranking candidate set."""
    from etl_framework_spark.queries.corpus import ivf_topk

    exact = _exact_pairs(spark, sf)
    ivf = {
        (r.qid, r.vid)
        for r in ent.queries()["llm_sim_ivf"](spark, sf).collect()
    }
    recall = len(exact & ivf) / len(exact)
    n = table(spark, sf, "embeddings").count()
    cand = ivf_topk(spark, sf, _return_candidates=True)
    n_cand = cand.count()
    n_q = cand.select("qid").distinct().count()
    scan_fraction = n_cand / (n_q * (n - 1))
    assert recall > 1.5 * scan_fraction, (sf, recall, scan_fraction)


@pytest.mark.parametrize("sf", _SCALES)
def test_sq8_recall_and_true_cosines(spark, sf):
    """SQ8 is a scan accelerator, not a pruning index: int8
    quantization on 64 dims must barely dent recall (≥0.9 of the
    exact top-k at every scale), and the rescore stage must report
    TRUE cosines on the overlap."""
    exact = {
        (r.qid, r.vid): r.cos_sim
        for r in ent.queries()["llm_sim_topk"](spark, sf).collect()
    }
    sq8 = {
        (r.qid, r.vid): r.cos_sim
        for r in ent.queries()["llm_sim_sq8"](spark, sf).collect()
    }
    overlap = set(exact) & set(sq8)
    recall = len(overlap) / len(exact)
    assert recall >= 0.9, (sf, recall)
    for pair in overlap:
        assert abs(exact[pair] - sq8[pair]) < 1e-9


# ---------------------------------------------------------------------------
# Planted-neighbor recall (VERDICT r8 item 7): the base corpus is
# near-uniform (true neighbors at cos≈0.45), so the ratio tests above
# only prove better-than-chance. The probe replicas are themselves a
# deterministic planted structure: replica k of vector v is v + k·1e-3
# on every dim (tools/scale_probe.build_inflated), i.e. every vector
# has factor−1 near-twins at cos ≈ 1 with KNOWN ids. A useful ANN/IVF
# index must retrieve those — recall@10 ≥ 0.8 on the planted twins.
# ---------------------------------------------------------------------------

X30 = os.path.join(os.path.dirname(X10), "x30")
_PROBES = [
    (path, factor)
    for path, factor in [(X10, 10), (X30, 30)]
    if os.path.exists(os.path.join(path, ".complete"))
]
N_BASE = 2_000  # sf0.1 base vectors; replica ids = base_id + k*N_BASE


@pytest.mark.parametrize("probe", _PROBES, ids=[f"x{f}" for _, f in _PROBES])
@pytest.mark.parametrize("key", ["llm_sim_ann", "llm_sim_ivf"])
def test_planted_twin_recall(spark, key, probe):
    path, factor = probe
    from collections import defaultdict

    by_q: dict[int, set[int]] = defaultdict(set)
    for r in ent.queries()[key](spark, path).collect():
        by_q[r.qid].add(r.vid)
    hits = denom = 0
    for qid, vids in by_q.items():
        twins = {qid % N_BASE + k * N_BASE for k in range(factor)} - {qid}
        hits += len(vids & twins)
        denom += min(10, len(twins))
    recall = hits / denom
    assert recall >= 0.8, (key, path, recall)
