"""S4/S6 JDBC source+sink against embedded Derby (in Spark's jars, so
the whole path — DataFrameWriter JDBC DDL+insert, partitioned JDBC
reads — runs for real with no external server)."""

from __future__ import annotations

import pytest

from etl_framework_spark.catalog import table
from etl_framework_spark.sources.readers import read_source, write_sink
from tests.conftest import SF_SMALL

URL = "jdbc:derby:memory:etltest;create=true"
DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def supplier_in_derby(spark):
    df = table(spark, SF_SMALL, "supplier")
    write_sink(
        df,
        {"format": "jdbc", "url": URL, "dbtable": "supplier", "options": DRIVER},
    )
    return df


def test_jdbc_roundtrip(spark, supplier_in_derby):
    back = read_source(
        spark,
        {"format": "jdbc", "url": URL, "dbtable": "supplier", "options": DRIVER},
    )
    assert sorted(map(str, back.collect())) == sorted(
        map(str, supplier_in_derby.collect())
    )


def test_jdbc_partitioned_parallel_read(spark, supplier_in_derby):
    """The 100 TB-relevant path: partitionColumn/numPartitions splits
    the read into parallel range queries (one per executor task)."""
    lo, hi = [
        (r[0], r[1])
        for r in supplier_in_derby.selectExpr(
            "min(s_suppkey)", "max(s_suppkey)"
        ).collect()
    ][0]
    back = read_source(
        spark,
        {
            "format": "jdbc",
            "url": URL,
            "dbtable": "supplier",
            "options": {
                **DRIVER,
                "partitionColumn": "s_suppkey",
                "lowerBound": str(lo),
                "upperBound": str(hi + 1),
                "numPartitions": "4",
            },
        },
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == supplier_in_derby.count()


def test_jdbc_pushdown_reaches_source(spark, supplier_in_derby):
    """Filters must push into the JDBC scan (PushedFilters in the
    plan) so the database — not Spark — prunes rows."""
    from etl_framework_spark.plans import explain_str

    back = read_source(
        spark,
        {"format": "jdbc", "url": URL, "dbtable": "supplier", "options": DRIVER},
    ).filter("s_acctbal > 0")
    assert "PushedFilters" in explain_str(back)
