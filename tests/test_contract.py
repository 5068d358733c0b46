"""Fast inner loop: every registered query vs its DuckDB oracle at
sf0.001 (the driver's t2 gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as ent
from tests.conftest import SF_SMALL
from tools.check import compare

ALL_KEYS = sorted(ent.queries())


def test_entry_smoke(spark):
    df = ent.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("key", ALL_KEYS)
def test_query_vs_oracle(spark, duck, key):
    q = ent.queries()[key]
    oracles = ent.oracle_sql()
    spark_pdf = q(spark, SF_SMALL).toPandas()
    if key not in oracles:
        assert len(spark_pdf) >= 0  # rows-only contract: must execute
        return
    duck_pdf = duck.execute(oracles[key]).df()
    res = compare(key, spark_pdf, duck_pdf)
    assert res["status"] == "OK", res
