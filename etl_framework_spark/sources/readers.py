"""Declarative source readers and sink writers (SURVEY.md §2.1).

The reference family declares sources/sinks in job configs (CSV/JSON
files, JDBC, Hive) and delegates IO to Spark's DataSource API; this is
the same surface as spec dicts:

    {"format": "parquet"|"csv"|"json"|"jdbc"|"table", "path"|"url"|"name": ...,
     "schema": "a INT, b STRING",   # optional DDL (schema-on-read)
     "options": {...},              # passed through to the reader
     "stream": true}                # readStream instead of read

JDBC is tested against the embedded Derby engine Spark ships in its
jars (in-JVM, no network): tests/test_jdbc.py round-trips a table
through `jdbc:derby:memory:` with partitioned parallel reads. Remote
JDBC servers remain untested in this environment (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_FILE_FORMATS = {"parquet", "csv", "json", "orc"}


def read_source(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    fmt = spec.get("format", "parquet")
    options = dict(spec.get("options", {}))
    if fmt == "jdbc":
        required = {"url", "dbtable"}
        missing = required - set(spec)
        if missing:
            raise ValueError(f"jdbc source missing {sorted(missing)}")
        reader = spark.read.format("jdbc").option("url", spec["url"]).option(
            "dbtable", spec["dbtable"]
        )
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    if fmt == "table":  # catalog/metastore-backed (Hive-style) source
        # The reference family reads Hive tables by name from job
        # configs; here the session catalog (in-memory or Hive
        # metastore, whatever the session was built with) resolves the
        # name. Partition pruning/stats come from the catalog entry —
        # at cluster scale this is the path that sees Hive partitions.
        if "name" not in spec:
            raise ValueError("table source needs 'name'")
        if not spark.catalog.tableExists(spec["name"]):
            raise ValueError(f"table source: {spec['name']!r} not in catalog")
        return spark.read.options(**options).table(spec["name"])
    if fmt == "docstore":  # custom Python DataSource connector
        from etl_framework_spark.sources.docstore import register

        register(spark)
        return (
            spark.read.format("docstore")
            .options(**options)
            .option("path", spec["path"])
            .load()
        )
    if fmt not in _FILE_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}")
    if "path" not in spec:
        raise ValueError(f"{fmt} source needs 'path'")
    reader = spark.readStream if spec.get("stream") else spark.read
    if spec.get("schema"):
        reader = reader.schema(spec["schema"])
    elif fmt == "csv" and not spec.get("stream"):
        options.setdefault("inferSchema", True)
    if fmt == "csv":
        options.setdefault("header", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(spec["path"])


def write_sink(df: DataFrame, spec: dict[str, Any]) -> None:
    fmt = spec.get("format", "parquet")
    if fmt == "view":  # in-memory sink: register for downstream consumers
        df.createOrReplaceTempView(spec["name"])
        return
    if fmt == "table":  # catalog-managed (saveAsTable) sink — the
        # write half of the {"format": "table"} source above
        writer = df.write.mode(spec.get("mode", "overwrite"))
        if spec.get("partition_by"):
            writer = writer.partitionBy(*spec["partition_by"])
        for k, v in dict(spec.get("options", {})).items():
            writer = writer.option(k, v)
        writer.saveAsTable(spec["name"])
        return
    if fmt == "jdbc":
        required = {"url", "dbtable"}
        missing = required - set(spec)
        if missing:
            raise ValueError(f"jdbc sink missing {sorted(missing)}")
        writer = (
            df.write.format("jdbc")
            .mode(spec.get("mode", "overwrite"))
            .option("url", spec["url"])
            .option("dbtable", spec["dbtable"])
        )
        for k, v in dict(spec.get("options", {})).items():
            writer = writer.option(k, v)
        writer.save()
        return
    if fmt == "docstore":
        from etl_framework_spark.sources.docstore import register

        register(df.sparkSession)
        (
            df.write.format("docstore")
            .mode(spec.get("mode", "overwrite"))
            .options(**dict(spec.get("options", {})))
            .option("path", spec["path"])
            .save()
        )
        return
    if fmt not in _FILE_FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}")
    if spec.get("cluster_by"):
        # Global clustering on write: range-repartition so each output
        # task owns a disjoint key range, then sort locally — file and
        # row-group min/max stats become tight AND non-overlapping, so
        # downstream scans on the cluster key skip whole files. One
        # range shuffle at write time buys every future read.
        cols = list(spec["cluster_by"])
        n = spec.get("cluster_partitions")
        df = (
            df.repartitionByRange(int(n), *cols)
            if n
            else df.repartitionByRange(*cols)
        ).sortWithinPartitions(*cols)
    elif spec.get("sort_by"):
        # Local-only clustering: sort within existing partitions so
        # row-group min/max stats are tight (no extra shuffle). Use
        # when the upstream partitioning already groups the key.
        df = df.sortWithinPartitions(*spec["sort_by"])
    writer = df.write.mode(spec.get("mode", "overwrite"))
    if spec.get("partition_by"):
        writer = writer.partitionBy(*spec["partition_by"])
    options = dict(spec.get("options", {}))
    if fmt == "csv":
        options.setdefault("header", True)  # symmetric with the reader default
    for k, v in options.items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(spec["path"])
