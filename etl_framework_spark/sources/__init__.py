"""Source/sink connectors (SURVEY.md §2.1 S1–S9)."""

from etl_framework_spark.sources.readers import read_source, write_sink

__all__ = ["read_source", "write_sink"]
