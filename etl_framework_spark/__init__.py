"""etl_framework_spark — a PySpark-native analytics/ETL engine.

Capability-equivalent rebuild of the config-driven Spark ETL framework
surveyed in SURVEY.md (reference `abhioncbr/etl-framework`; the reference
checkout is absent on this machine — see SURVEY.md §0 — so every operator
row cites SURVEY.md §2 instead of reference file:line).

Architecture (SURVEY.md §7): a thin Python package where every operator is
a pure ``DataFrame -> DataFrame`` function built ONLY from the public
PySpark DataFrame/SQL API; Catalyst does all optimization. No custom
execution engine.
"""

from etl_framework_spark.registry import QUERIES, ORACLES, query

__all__ = ["QUERIES", "ORACLES", "query"]
__version__ = "0.1.0"
