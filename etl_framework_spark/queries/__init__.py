"""Contract queries (SURVEY.md §2). Importing this package populates
``etl_framework_spark.registry.QUERIES`` / ``ORACLES``."""

from etl_framework_spark.queries import relational  # noqa: F401
from etl_framework_spark.queries import aggregates  # noqa: F401

_MODULES = ["relational", "aggregates"]

# Grown incrementally as phases land (SURVEY.md §7); keep imports explicit
# so a broken module fails loudly at import time, not at judge time.
for _m in [
    "windows",
    "fn_families",
    "llm",
    "vector_q",
    "asof_q",
    "streaming_q",
    "udx",
    "pipeline_q",
    "extras",
    "extras2",
    "corpus",
    "tpch_like",
    "tpch_like2",
    "training",
    "cdc_q",
    "extras3",
    "extras4",
    "extras5",
    "extras6",
    "analytics",
    "quality",
    "lm_stats",
    "extras7",
    "extras8",
    "cluster_q",
    "profiling",
    "bpe_q",
    "extras9",
    "extras10",
    "extras11",
    "extras12",
    "extras13",
    "extras14",
    "extras15",
    "extras16",
    "extras17",
    "extras18",
    "extras19",
    "extras20",
    "extras21",
    "extras22",
    "extras23",
    "extras24",
    "extras25",
    "extras26",
    "extras27",
    "extras28",
    "extras29",
    "extras30",
    "extras31",
    "extras32",
    "extras33",
    "extras34",
    "extras35",
    "extras36",
    "extras37",
    "extras38",
    "extras39",
    "extras40",
    "extras41",
    "extras42",
    "extras43",
    "extras44",
    "extras45",
    "extras46",
    "extras47",
    "extras48",
    "extras49",
    "extras50",
    "extras51",
    "extras52",
    "extras53",
]:
    # No try/except: a broken module must fail HERE, at import time —
    # swallowing ImportError would silently drop its keys from the
    # contract surface the driver compares against.
    __import__(f"etl_framework_spark.queries.{_m}")
    _MODULES.append(_m)
