"""Custom Python DataSource connector (docstore): per-file partition
planning, line-streamed reads, task-parallel writes — end-to-end
through sources.readers and a pipeline spec."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_framework_spark.sources.readers import read_source, write_sink


def _make_store(path, n_files=4, docs_per_file=5):
    os.makedirs(path, exist_ok=True)
    i = 0
    for f in range(n_files):
        with open(os.path.join(path, f"shard{f}.jsonl"), "w") as fh:
            for _ in range(docs_per_file):
                fh.write(
                    json.dumps(
                        {"doc_id": i, "text": f"doc number {i}", "meta": {"shard": f}}
                    )
                    + "\n"
                )
                i += 1


def test_docstore_read_partitions_per_file(spark, tmp_path):
    store = str(tmp_path / "store")
    _make_store(store, n_files=4, docs_per_file=5)
    df = read_source(spark, {"format": "docstore", "path": store})
    assert df.rdd.getNumPartitions() == 4  # one task per shard file
    assert df.count() == 20
    row = df.filter(F.col("doc_id") == 7).first()
    assert row.text == "doc number 7"
    assert json.loads(row.meta) == {"shard": 1}


def test_docstore_write_read_roundtrip(spark, tmp_path):
    store = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _make_store(store, n_files=3, docs_per_file=4)
    df = read_source(spark, {"format": "docstore", "path": store})
    write_sink(df.filter("doc_id % 2 = 0"), {"format": "docstore", "path": out})
    back = read_source(spark, {"format": "docstore", "path": out})
    assert sorted(r.doc_id for r in back.collect()) == list(range(0, 12, 2))
    # overwrite mode replaces prior contents
    write_sink(df.filter("doc_id = 1"), {"format": "docstore", "path": out})
    assert [r.doc_id for r in read_source(
        spark, {"format": "docstore", "path": out}
    ).collect()] == [1]


def test_docstore_in_pipeline_spec(spark, tmp_path):
    from etl_framework_spark.pipeline import run_pipeline

    store = str(tmp_path / "store")
    _make_store(store, n_files=2, docs_per_file=6)
    rel = run_pipeline(
        spark,
        {
            "sources": {"docs": {"format": "docstore", "path": store}},
            "steps": [
                {
                    "name": "long_docs",
                    "input": "docs",
                    "op": "filter",
                    "args": {"condition": "doc_id >= 6"},
                }
            ],
            "sinks": [
                {
                    "input": "long_docs",
                    "format": "docstore",
                    "path": str(tmp_path / "filtered"),
                }
            ],
        },
    )
    assert rel["long_docs"].count() == 6
    back = read_source(
        spark, {"format": "docstore", "path": str(tmp_path / "filtered")}
    )
    assert back.count() == 6
