"""r12: connected_components collects the edge list under a capped
guard and union-finds in-process; above the cap it keeps the
distributed label-propagation fixpoint. Pin (a) the two paths against
each other on adversarial graphs and (b) the pure union-find helper
against brute-force reachability."""
import pytest

from etl_framework_spark.operators import graph as G


def _brute(edges: list) -> dict:
    nodes = {n for e in edges for n in e}
    comp = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(comp[a], comp[b])
            if comp[a] != m or comp[b] != m:
                comp[a] = comp[b] = m
                changed = True
    return comp


@pytest.mark.parametrize(
    "edges",
    [
        [(2, 1), (3, 2), (4, 3)],                      # chain
        [(10, 1), (10, 2), (20, 21), (5, 5)],          # star + pair + loop
        [(1, 2), (3, 4), (2, 3), (100, 4)],            # late merge
        [(7, 7)],                                      # pure self-loop
    ],
)
def test_uf_matches_brute_force(edges):
    got = dict(G._uf_components([a for a, _ in edges], [b for _, b in edges]))
    assert got == _brute(edges)


def test_driver_and_distributed_paths_agree(spark, monkeypatch):
    edges = [(2, 1), (3, 2), (9, 8), (4, 3), (7, 9), (11, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {r.node: r.component for r in G.connected_components(df).collect()}
    # force the distributed fixpoint by shrinking the collect cap
    monkeypatch.setattr(G, "_CC_COLLECT_CAP", 0)
    slow = {r.node: r.component for r in G.connected_components(df).collect()}
    assert fast == slow
    assert fast == _brute(edges)


def test_empty_edge_list_yields_empty_frame(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert G.connected_components(df).collect() == []
