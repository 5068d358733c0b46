"""Direct unit tests for the round-6 Arrow-batched kernels.

Both kernels exist purely as faster evaluations of declarative forms
that Catalyst runs interpreted; these tests pin the bit-parity claim
directly (kernel output == declarative output, element for element)
independent of the oracle sweep.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.operators.dedup import shingles3
from etl_framework_spark.operators.similarity import anchor_knn

SF = "/root/testdata/sf0.001"


def _declarative_shingles(docs):
    toks = F.split(F.col("text"), " ")
    return docs.filter(F.size(toks) >= 3).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            )
        ).alias("sh"),
    )


def test_shingles3_matches_declarative_form(spark):
    docs = table(spark, SF, "documents")
    got = {
        (r["doc_id"], r["s"])
        for r in shingles3(docs).select("doc_id", "s").collect()
    }
    want = {
        (r["doc_id"], s)
        for r in _declarative_shingles(docs).collect()
        for s in r["sh"]
    }
    assert got == want and len(got) > 0


def test_shingles3_n_is_distinct_shingle_count(spark):
    docs = table(spark, SF, "documents")
    out = shingles3(docs)
    bad = (
        out.groupBy("doc_id", "n")
        .agg(F.countDistinct("s").alias("k"))
        .filter("k <> n")
        .count()
    )
    assert bad == 0


def test_shingles3_skips_short_docs(spark):
    two_tok = spark.createDataFrame([(1, "a b"), (2, "x y z")], "doc_id long, text string")
    rows = shingles3(two_tok).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert rows[0]["s"] == "x y z"


def test_anchor_knn_matches_bruteforce_fold(spark):
    emb = table(spark, SF, "embeddings").select("vec_id", "embedding")
    anchors = emb.filter("vec_id % 7 = 0")
    k, quant = 3, 1e6
    local = anchor_knn(emb, anchors, k=k, quant=quant)
    got = (
        local.withColumn(
            "rk", F.row_number().over(W.partitionBy("i").orderBy("qd2", "j"))
        )
        .filter(F.col("rk") <= k)
        .select("i", "j", "qd2", "rk")
    )
    # brute force with the exact JVM fold the kernel claims parity with
    v = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    a = v.filter("vec_id % 7 = 0").select(F.col("vec_id").alias("i"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("j"), F.col("e").alias("eb"))
    diffs = F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y))
    d2 = F.aggregate(
        F.slice(diffs, 2, F.size(diffs) - 1),
        F.element_at(diffs, 1),
        lambda x, y: x + y,
    )
    want = (
        a.join(b, F.col("i") != F.col("j"))
        .select("i", "j", F.floor(d2 * quant + 0.5).alias("qd2"))
        .withColumn("rk", F.row_number().over(W.partitionBy("i").orderBy("qd2", "j")))
        .filter(F.col("rk") <= k)
    )
    gs = {tuple(r) for r in got.collect()}
    ws = {tuple(r) for r in want.collect()}
    assert gs == ws and len(gs) > 0


def test_anchor_knn_guards_unbounded_anchor_collect(spark):
    import pytest

    import etl_framework_spark.operators.similarity as sim

    emb = table(spark, SF, "embeddings").select("vec_id", "embedding")
    old = sim._MAX_ANCHOR_COLLECT
    sim._MAX_ANCHOR_COLLECT = 5
    try:
        with pytest.raises(ValueError, match="anchor set exceeds"):
            sim.anchor_knn(emb, emb, k=2, quant=1e6)
    finally:
        sim._MAX_ANCHOR_COLLECT = old


def test_anchor_knn_empty_anchor_set_raises_clearly(spark):
    import pytest

    emb = table(spark, SF, "embeddings").select("vec_id", "embedding")
    none = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="anchor set is empty"):
        anchor_knn(emb, none, k=2, quant=1e6)


def test_anchor_knn_overflow_clips_not_wraps(spark):
    """ADVICE r6: float->int64 overflow in numpy wraps to INT64_MIN,
    which would sort ahead of every real distance; the kernel must
    clip (JVM floor-to-bigint saturates at Long.MAX instead)."""
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [4.0e9])], "vec_id long, embedding array<double>"
    )
    out = anchor_knn(df, df, k=2, quant=1e9).collect()
    # pair distance d2 = 1.6e19, d2*quant ≈ 1.6e28 >> int64 — must not
    # produce a negative qd2, and the self-pair mask must survive
    assert len(out) > 0
    assert all(r["qd2"] >= 0 for r in out)


def test_co_occurrence_pairs_matches_naive_join(spark):
    """The one-shuffle collect_set pair build (shared by
    graph_kcore_peel / graph_assortativity, r7) must produce exactly
    the distinct+self-join formulation it replaced, under the degree
    cap."""
    from etl_framework_spark.operators.graph import co_occurrence_pairs

    li = table(spark, SF, "lineitem")
    got = co_occurrence_pairs(li, "l_partkey", "l_suppkey", 200)
    e0 = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    deg_ok = (
        e0.groupBy("p").count().filter(F.col("count").between(2, 200)).select("p")
    )
    e0f = e0.join(deg_ok, "p", "left_semi")
    a = e0f.select("p", F.col("s").alias("u"))
    b = e0f.select("p", F.col("s").alias("v"))
    want = (
        a.join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_co_occurrence_pairs_degree_cap_drops_super_groups(spark):
    from etl_framework_spark.operators.graph import co_occurrence_pairs

    df = spark.createDataFrame(
        [("g1", i) for i in range(5)] + [("g2", i) for i in range(2)],
        "grp string, item int",
    )
    # cap=4 drops g1 (degree 5) entirely; g2 contributes its one pair
    got = co_occurrence_pairs(df, "grp", "item", max_group_degree=4)
    assert [tuple(r) for r in got.collect()] == [(0, 1, 1.0)]


def test_simhash_banding_is_recall_exact(spark):
    """Pigeonhole guarantee: the banded candidate join must recover
    EXACTLY the pairs the full (lang)-block join finds at Hamming <= 3
    on the same 32-bit signatures — banding is a scale optimization,
    not an approximation."""
    from etl_framework_spark.operators.dedup import md5_per_token, simhash_bits
    from etl_framework_spark.operators.textops import tokens
    from etl_framework_spark.queries.dedup_banded import llm_dedup_simhash_banded
    from etl_framework_spark.catalog import table as _table

    got = {
        tuple(r)
        for r in llm_dedup_simhash_banded(spark, SF).collect()
    }
    sh = (
        _table(spark, SF, "documents")
        .withColumn("__h", md5_per_token(F.array_distinct(tokens("text"))))
        .select("doc_id", "lang", simhash_bits(F.col("__h"), 32).alias("sh"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    want = {
        tuple(r)
        for r in a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= 3)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_prefix_filtered_jaccard_matches_token_join(spark):
    """One-sided prefix filtering (AllPairs) must recover EXACTLY the
    shared-token join's qualifying pairs — it is a scale optimization,
    not an approximation. (Float-ceil prefix lengths would silently
    drop pairs; the operator computes ceil in integer arithmetic.)"""
    from etl_framework_spark.operators.dedup import (
        blocked_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )
    from etl_framework_spark.operators.textops import tokens
    from etl_framework_spark.catalog import table as _table

    toksets = _table(spark, SF, "documents").select(
        "doc_id", "lang", "source",
        F.array_distinct(tokens("text")).alias("ts"),
    )
    old = {
        (r.id_a, r.id_b, round(r.jac, 6))
        for r in blocked_jaccard_pairs(toksets)
        .filter(F.col("jac") >= 0.2)
        .collect()
    }
    new = {
        (r.id_a, r.id_b, round(r.jac, 6))
        for r in prefix_filtered_jaccard_pairs(toksets, 1, 5).collect()
    }
    assert new == old and len(new) > 0


def test_attach_minhash_skips_null_tokens(spark):
    """ADVICE r11: a NULL element inside the token array must behave
    like the Column form (md5(NULL)=NULL, skipped by array_min) — same
    signature as the array with the NULL removed, and an all-NULL
    array degrades to the empty-array NULL signature."""
    from etl_framework_spark.operators.dedup import attach_minhash

    df = spark.createDataFrame(
        [
            (1, ["a", None, "b"]),
            (2, ["a", "b"]),
            (3, [None]),
            (4, []),
        ],
        "doc_id long, ts array<string>",
    )
    out = {r.doc_id: tuple(r[f"s{i}"] for i in range(4))
           for r in attach_minhash(df, "ts", 4).collect()}
    assert out[1] == out[2]
    assert out[3] == out[4] == (None,) * 4
