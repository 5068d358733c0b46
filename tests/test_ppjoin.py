"""PPJoin-filtered exact Jaccard (operators/dedup.ppjoin_*).

The oracle sweep pins llm_dedup_jaccard_ppjoin's values; these tests
pin the CLAIMS the key's docstring makes: (1) the filter stack is
lossless — pair sets equal the one-sided AllPairs path at the same
τ, and brute force on an adversarial corpus; (2) the filters
actually REDUCE candidates at τ=0.7 (the whole point of shipping the
key); (3) boundary behavior of the integer α arithmetic.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.operators.dedup import (
    _rarity_prefixed,
    ppjoin_candidate_pairs,
    ppjoin_jaccard_pairs,
    prefix_filtered_jaccard_pairs,
)
from etl_framework_spark.operators.textops import tokens
from tests.conftest import SF_SMALL

TAU = (7, 10)


def _toksets(spark):
    docs = table(spark, SF_SMALL, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(tokens("text")).alias("ts"),
    )


def _pairs(df):
    return {
        (r.id_a, r.id_b, round(r.jac, 6))
        for r in df.select("id_a", "id_b", F.round("jac", 6).alias("jac")).collect()
    }


def test_ppjoin_equals_one_sided_prefix_path(spark):
    tk = _toksets(spark)
    pp = _pairs(ppjoin_jaccard_pairs(tk, *TAU))
    pre = _pairs(prefix_filtered_jaccard_pairs(tk, *TAU))
    assert pp == pre
    assert len(pp) > 0  # fixture guarantees near-dups exist


def test_ppjoin_strictly_reduces_candidates(spark):
    """At τ=0.7 the symmetric prefix + length + positional filters
    must admit strictly fewer candidates than the one-sided prefix
    join (docstring: 948 vs 1 559 at sf0.01; the margin, not the
    exact figures, is the contract)."""
    tk = _toksets(spark)
    tok = tk.select("doc_id", "lang", "source", F.explode("ts").alias("tok"))
    pre = _rarity_prefixed(tk, *TAU)
    pa = pre.select(F.col("doc_id").alias("id_a"), "lang", "source", "tok")
    tb = tok.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("__l2"),
        F.col("source").alias("__s2"),
        F.col("tok").alias("__t2"),
    )
    one_sided = (
        pa.join(
            tb,
            (F.col("lang") == F.col("__l2"))
            & (F.col("source") == F.col("__s2"))
            & (F.col("tok") == F.col("__t2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    pp = ppjoin_candidate_pairs(tk, *TAU).count()
    true_pairs = ppjoin_jaccard_pairs(tk, *TAU).count()
    assert true_pairs <= pp < one_sided, (pp, one_sided, true_pairs)
    # the reduction should be material, not a rounding artifact
    assert pp <= 0.8 * one_sided, f"only {one_sided - pp} pruned"


def test_ppjoin_brute_force_on_adversarial_sets(spark):
    """Boundary corpus: pairs engineered to sit exactly at and just
    below τ, shared tokens pushed to prefix/suffix edges, size-
    mismatched pairs, and a disjoint pair — the filter stack must
    reproduce brute force exactly."""
    docs = [
        (1, ["a", "b", "c", "d", "e"]),
        (2, ["a", "b", "c", "d", "f"]),   # jac(1,2)=4/6=0.667 < 0.7
        (3, ["a", "b", "c", "d", "e"]),   # jac(1,3)=1.0
        (4, ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"]),
        (5, ["a", "b", "c", "d", "e", "f", "g", "h", "i", "k"]),
        # jac(4,5)=9/11=0.818 ≥ 0.7; shared suffix-heavy
        (6, ["x", "y", "z"]),             # disjoint island
        (7, ["a", "b"]),                  # tiny: length filter vs 4/5
        (8, ["q", "r", "s", "t", "u", "v", "w"]),
        (9, ["q", "r", "s", "t", "u", "v", "w"]),  # identical pair
    ]
    tk = spark.createDataFrame(
        [(i, "en", "s0", ts) for i, ts in docs],
        "doc_id long, lang string, source string, ts array<string>",
    )
    got = {(a, b) for a, b, _ in _pairs(ppjoin_jaccard_pairs(tk, *TAU))}
    want = set()
    sets = {i: set(ts) for i, ts in docs}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter / union >= 0.7:
            want.add((a, b))
    assert got == want, f"got {sorted(got)} want {sorted(want)}"


def test_one_sided_filters_brute_force_low_tau(spark):
    """r12: prefix_filtered_jaccard_pairs carries PPJoin's length
    filter plus a one-sided positional filter. Brute-force parity at
    τ=0.2 (the llm_dedup_jaccard_prefix regime) on a corpus built to
    stress both filters: extreme length mismatches (the length filter
    fires) and pairs whose only shared token is deep in A's prefix
    (the positional bound fires or just barely clears)."""
    docs = [
        (1, ["a", "b", "c", "d", "e"]),
        (2, ["a"] + [f"z{i}" for i in range(30)]),   # 5/31: length kill
        (3, ["d", "e", "f", "g"]),                    # jac(1,3)=2/7=0.286
        (4, ["e", "h", "i", "j", "k", "l", "m"]),     # jac(1,4)=1/11<0.2
        (5, ["a", "b", "c", "d", "e"]),               # identical to 1
        (6, [f"q{i}" for i in range(10)] + ["e"]),    # jac(1,6)=1/15<0.2
        (7, ["c", "d", "e", "f", "g"]),               # jac(3,7)=4/5, jac(1,7)=3/7
    ]
    tk = spark.createDataFrame(
        [(i, "en", "s0", ts) for i, ts in docs],
        "doc_id long, lang string, source string, ts array<string>",
    )
    got = {(a, b) for a, b, _ in _pairs(prefix_filtered_jaccard_pairs(tk, 1, 5))}
    sets = {i: set(ts) for i, ts in docs}
    want = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter / union >= 0.2:
            want.add((a, b))
    assert got == want, f"got {sorted(got)} want {sorted(want)}"
