"""Pipeline-layer contract queries (SURVEY.md §3.2 E1, §2.1 S5).

`pipeline_spec_q1` proves the spec-driven engine end-to-end against
the same DuckDB oracle as the flagship query: config dict → sources →
declarative steps → result. `sink_roundtrip_parquet` proves the
partitioned parquet sink preserves data exactly (write → re-read →
aggregate vs oracle on the original table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.pipeline import run_pipeline
from etl_framework_spark.registry import query
from etl_framework_spark.session import prep

_Q1_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query("pipeline_spec_q1", oracle=_Q1_ORACLE)
def pipeline_spec_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-equivalent entry point (E1): the flagship Q1 shape
    declared entirely as a config dict — sources + expression-string
    steps — compiled and run by the pipeline engine."""
    prep(spark)
    spec = {
        "sources": {
            "lineitem": {"format": "parquet", "path": f"{sf_dir}/lineitem.parquet"}
        },
        "steps": [
            {
                "name": "filtered",
                "input": "lineitem",
                "op": "filter",
                "args": {"condition": "l_shipdate <= timestamp'1998-09-02'"},
            },
            {
                "name": "result",
                "input": "filtered",
                "op": "aggregate",
                "args": {
                    "group_by": ["l_returnflag", "l_linestatus"],
                    "aggs": {
                        "sum_qty": "round(sum(l_quantity), 2)",
                        "sum_disc_price": (
                            "round(sum(l_extendedprice * (1 - l_discount)), 2)"
                        ),
                        "avg_disc": "round(avg(l_discount), 6)",
                        "count_order": "count(*)",
                    },
                },
            },
        ],
    }
    return run_pipeline(spark, spec)["result"]


@query(
    "sink_roundtrip_parquet",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem WHERE l_quantity > 25
    GROUP BY l_returnflag
    """,
)
def sink_roundtrip_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink round-trip (S5): write the filtered
    fact partitioned by l_returnflag, re-read, aggregate — must match
    the oracle computed on the ORIGINAL table exactly."""
    prep(spark)
    out = f"/root/repo/.scratch/sink_roundtrip_{os.path.basename(sf_dir.rstrip('/'))}"
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 25)
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )
