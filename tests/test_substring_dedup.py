"""Unit tests for the round-2 batch-6 operators (substring_dedup.py):
algebraic invariants cheap enough for sf0.001 — the exact-value gate is
tools/check.py against the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


def test_dedup_substr_invariants(spark):
    """One row per document; dup windows never exceed total windows;
    window count equals max(0, n_tokens - 19) for every document."""
    pdf = ent.queries()["llm_dedup_substr"](spark, SF_SMALL).toPandas()
    docs = table(spark, SF_SMALL, "documents")
    n = docs.count()
    assert len(pdf) == n
    assert (pdf.dup_windows <= pdf.n_windows).all()
    assert (pdf.dup_frac <= 1.0).all() and (pdf.dup_frac >= 0.0).all()
    ntok = {
        r["doc_id"]: r["nt"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("nt")
        ).collect()
    }
    for row in pdf.itertuples():
        assert row.n_windows == max(0, ntok[row.doc_id] - 19)


def test_dedup_substr_detects_injected_duplicate(spark):
    """Two byte-identical 40-token documents must have dup_frac == 1
    under the same window/count/flag pipeline (rebuilt on a toy frame
    via the identical expressions)."""
    text = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"x{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], ["doc_id", "text"]
    )
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.filter(F.size("toks") >= 20).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 19),"
                " i -> md5(array_join(slice(toks, i, 20), ' ')))"
            )
        ).alias("g"),
    )
    counts = grams.groupBy("g").agg(F.count("*").alias("c"))
    per_doc = (
        grams.join(counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("nw"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("dw"),
        )
        .collect()
    )
    by_id = {r["doc_id"]: (r["nw"], r["dw"]) for r in per_doc}
    assert by_id[1] == (21, 21)  # every window duplicated in doc 2
    assert by_id[2] == (21, 21)
    assert by_id[3] == (21, 0)  # unique content: nothing flagged


def test_mm_dedup_exact_report(spark):
    """Asset accounting: assets = corpus size, unique <= assets, and
    the redundancy identity holds."""
    pdf = ent.queries()["mm_dedup_exact"](spark, SF_SMALL).toPandas()
    assert len(pdf) == 1
    row = pdf.iloc[0]
    n = table(spark, SF_SMALL, "documents").count()
    assert row.n_assets == n
    assert row.n_unique <= row.n_assets
    assert row.n_redundant == row.n_assets - row.n_unique
    assert row.bytes_saved >= 0
    assert row.max_copies >= 1


def test_ts_holt_matches_python_fold(spark):
    """The declarative Holt fold reproduces a plain Python recurrence
    over the same ordered daily counts (same IEEE op order)."""
    ev = table(spark, SF_SMALL, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(float(r["cnt"]))
    expect = {}
    for et, xs in series.items():
        l, b = xs[0], 0.0
        for x in xs[1:]:
            ln = x * 0.5 + (l + b) * 0.5
            bn = (x * 0.5 + (l + b) * 0.5 - l) * 0.3 + b * 0.7
            l, b = ln, bn
        q = lambda v: __import__("math").floor(v * 1e6 + 0.5) / 1e6
        expect[et] = (len(xs), q(l), q(b), q(l + b))
    pdf = ent.queries()["ts_holt"](spark, SF_SMALL).toPandas()
    assert len(pdf) == len(expect)
    for row in pdf.itertuples():
        n_days, lvl, tr, fc = expect[row.event_type]
        assert row.n_days == n_days
        assert row.level == lvl
        assert row.trend == tr
        assert row.forecast_1 == fc


def test_train_prep_pipeline_accounts_for_corpus(spark):
    """Split labels are exactly train/test and the deduped doc count
    never exceeds the gated corpus size."""
    pdf = ent.queries()["pipeline_train_prep"](spark, SF_SMALL).toPandas()
    assert set(pdf.split.unique()) <= {"train", "test"}
    docs = table(spark, SF_SMALL, "documents")
    gated = docs.filter("n_chars BETWEEN 60 AND 2400").count()
    assert 0 < pdf.n_docs.sum() <= gated
    assert (pdf.tot_tokens > 0).all()
