"""r12: llm_greedy_coverage's guarded candidate-pool greedy
(queries/feature_screen.py). The oracle sweep pins the key's values;
these tests pin the INTERNALS the rewrite introduced: the
certificate (pool-floor bound on excluded docs' marginals), the
global lowest-doc_id tie-break inside the pool scan, and fast-path ≡
Spark-fallback equality on real data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_framework_spark.cacheutil import persist_tracked
from etl_framework_spark.queries.feature_screen import (
    _gc_greedy_on_pool,
    _gc_spark_loop,
)
from tests.conftest import SF_SMALL


def _pool(*docs):
    # docs: (doc_id, tokens) — sorted like the query: total desc, id asc
    rows = [(d, set(ts), len(set(ts))) for d, ts in docs]
    return sorted(rows, key=lambda r: (-r[2], r[0]))


def test_certificate_fails_on_flat_totals():
    """Excluded docs could tie the best candidate marginal: best ==
    tau_g must return None (an excluded doc with an equal total and a
    lower doc_id could win the tie-break)."""
    pool = _pool((10, ["a", "b"]), (20, ["a", "c"]))
    # have_all=False: tau_g = 2 == best marginal -> cannot certify
    assert _gc_greedy_on_pool(pool, have_all=False) is None
    # have_all=True: same pool is decidable
    rows = _gc_greedy_on_pool(pool, have_all=True)
    assert rows[0][1] == 10  # tie at marginal 2 -> lowest doc_id


def test_certificate_fails_mid_greedy():
    """Step 1 certifies (strictly above the floor) but step 2's best
    marginal collapses to the floor -> None, not a wrong pick."""
    pool = _pool(
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "x"]),   # marginal 1 after pick 1
        (3, ["a", "b", "y"]),        # total 3 = tau_g
    )
    assert _gc_greedy_on_pool(pool, have_all=False) is None
    rows = _gc_greedy_on_pool(pool, have_all=True)
    assert [r[1] for r in rows][:2] == [1, 2]


def test_tiebreak_prefers_lower_doc_id_with_lower_total():
    """A lower-total doc that TIES the incumbent marginal must win
    when its doc_id is lower — the scan order is by total, not id."""
    pool = _pool(
        (9, ["a", "b", "c", "d"]),                # total 4: pick 1
        (7, ["a", "b", "x"]),                     # marginal 1 after
        (3, ["y"]),                               # marginal 1, id 3 < 7
    )
    rows = _gc_greedy_on_pool(pool, have_all=True)
    assert [r[1] for r in rows] == [9, 3, 7]


def test_early_stop_when_coverage_exhausted():
    pool = _pool((1, ["a", "b"]), (2, ["a", "b"]), (3, ["b"]))
    rows = _gc_greedy_on_pool(pool, have_all=True)
    assert len(rows) == 1  # everything covered by the first pick
    assert rows[0][1] == 1


def test_fast_path_equals_spark_fallback(spark):
    """The collected-pool greedy and the per-step Spark loop must
    produce identical rows on real data (SF_SMALL: 500 docs, pool
    holds everything -> certificate trivially true)."""
    from etl_framework_spark.catalog import table

    docs = table(spark, SF_SMALL, "documents")
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("l")).filter(
        F.size("l") >= 3
    )
    idx = t.select(
        "doc_id", "l",
        F.explode(F.sequence(F.lit(1), F.size("l") - 2)).alias("i"),
    )
    dt = idx.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("l", F.col("i")),
            F.element_at("l", F.col("i") + 1),
            F.element_at("l", F.col("i") + 2),
        ).alias("tok"),
    ).distinct().transform(persist_tracked)
    per_doc = dt.groupBy("doc_id").agg(
        F.collect_list("tok").alias("toks"),
        F.count(F.lit(1)).cast("bigint").alias("total"),
    )
    rows = per_doc.orderBy(F.desc("total"), "doc_id").collect()
    pool = [(r["doc_id"], set(r["toks"]), int(r["total"])) for r in rows]
    fast = _gc_greedy_on_pool(pool, have_all=True)
    totals = per_doc.select("doc_id", "total").transform(persist_tracked)
    slow = _gc_spark_loop(spark, dt, totals)
    totals.unpersist()
    dt.unpersist()
    assert fast == slow
