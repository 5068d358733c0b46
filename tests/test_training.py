"""Training-data pipeline ops (queries/training.py): invariants the
DuckDB oracle can't express — split determinism and coverage, packing
bin-budget bounds, contamination pair provenance, weight normalization."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _q(spark, key):
    return ent.queries()[key](spark, SF_SMALL)


def test_train_split_covers_corpus_and_is_stable(spark):
    rows = _q(spark, "train_split").collect()
    total = sum(r.n_docs for r in rows)
    assert total == 500  # every document lands in exactly one cell
    train = sum(r.n_docs for r in rows if r.split == "train")
    assert 0.80 <= train / total <= 0.95  # hash split tracks the 0.9 target
    again = {(r.lang, r.split): r.n_docs for r in _q(spark, "train_split").collect()}
    assert again == {(r.lang, r.split): r.n_docs for r in rows}  # deterministic


def test_pack_sequences_budget_and_coverage(spark):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    max_doc = d.select(F.size(F.split("text", " ")).alias("n")).agg(F.max("n")).first()[0]
    bins = _q(spark, "pack_sequences").collect()
    assert sum(r.n_docs for r in bins) == 500
    # greedy contiguous packing can overshoot by at most one document
    assert all(r.bin_tokens <= 256 + max_doc for r in bins)
    # bins are dense per source: 0..max_bin with no gaps
    by_src: dict[str, list[int]] = {}
    for r in bins:
        by_src.setdefault(r.source, []).append(r.bin)
    for src, ids in by_src.items():
        assert sorted(ids) == list(range(max(ids) + 1)), src


def test_contamination_pairs_cross_the_split(spark):
    pairs = _q(spark, "llm_contamination")
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "source")
    bad_eval = pairs.join(d, pairs.eval_doc == d.doc_id).filter(F.col("source") != "src0")
    bad_train = pairs.join(d, pairs.train_doc == d.doc_id).filter(F.col("source") == "src0")
    assert bad_eval.count() == 0 and bad_train.count() == 0
    assert pairs.filter(F.col("shared") < 3).count() == 0
    assert pairs.groupBy("train_doc", "eval_doc").count().filter("count > 1").count() == 0


def test_mix_weights_normalize(spark):
    rows = _q(spark, "mix_weights").collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # alpha=0.5 upweights the tail: smallest source gets more than its share
    smallest = min(rows, key=lambda r: r.n_docs)
    total = sum(r.n_docs for r in rows)
    assert smallest.weight > smallest.n_docs / total
