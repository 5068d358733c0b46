"""Structured Streaming surface (SURVEY.md §2.9).

Strategy: every streaming operator is implemented once over the
DataFrame API so identical code runs in batch (oracle-checked) and in
a micro-batch replay. `replay_events` drives the same events parquet
through readStream + availableNow and must converge to the batch
answer (tested in tests/test_streaming.py).
"""

from etl_framework_spark.streaming.harness import events_stream, replay_events

__all__ = ["replay_events", "events_stream"]
