"""Custom connector via the Spark 4 Python DataSource API (S-row
adjunct: the reference family's extensibility story is "add a
connector for your in-house store"; this is that path in pure
Python, no JVM code).

Format "docstore": a directory of JSONL files, one document per line
(`{"doc_id": ..., "text": ..., "meta": {...}}`).

- Read: one InputPartition PER FILE, so a 10k-file corpus fans out
  across the cluster; each task streams its file line-by-line (never
  whole-file in memory).
- Write: each task writes its partition to one part-file; commit is
  append-only (overwrite clears the directory first, driver-side).

Arrow/batching notes: the Python DataSource API ships rows through
Arrow; for bulk analytics the parquet path is still the fast lane —
this connector is the *integration* surface for systems that only
speak an in-house format.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "doc_id bigint, text string, meta string"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DocStoreReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docstore source needs option 'path'")

    def partitions(self) -> list[InputPartition]:
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )
        if not files:
            raise ValueError(f"no .jsonl files under {self.path!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield (
                    int(rec["doc_id"]),
                    rec.get("text"),
                    json.dumps(rec.get("meta", {}), sort_keys=True),
                )


class DocStoreWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docstore sink needs option 'path'")
        if overwrite:  # driver-side, before tasks launch
            if os.path.isdir(self.path):
                for f in os.listdir(self.path):
                    if f.endswith(".jsonl"):
                        os.remove(os.path.join(self.path, f))
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {
                            "doc_id": row.doc_id,
                            "text": row.text,
                            "meta": json.loads(row.meta) if row.meta else {},
                        }
                    )
                    + "\n"
                )
                n += 1
        if n == 0:  # don't litter empty part files
            os.remove(out)
        return WriterCommitMessage()


class DocStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docstore"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DocStoreReader:
        return DocStoreReader(self.options)

    def writer(self, schema, overwrite: bool) -> DocStoreWriter:
        return DocStoreWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(DocStoreDataSource)
