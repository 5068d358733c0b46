"""Kafka source/sink spec surface (SURVEY.md §7 environment note).

No broker and no spark-sql-kafka connector jar exist in this
environment, so load()/start() cannot run; what IS testable — and
tested here — is the full spec→option resolution (the part a user's
job config exercises), the value decode/encode transforms run on real
Spark against kafka-SHAPED DataFrames, and that the one untestable
step fails with an actionable error rather than a raw ClassNotFound.
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F

from etl_framework_spark.sources.readers import (
    decode_kafka_value,
    encode_kafka_value,
    kafka_sink_options,
    kafka_source_options,
    read_source,
)

KAFKA_SHAPE = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def _kafka_like(spark):
    rows = [
        (
            bytearray(b"k1"),
            bytearray(b'{"id": 1, "v": "a"}'),
            "t",
            0,
            100,
        ),
        (
            bytearray(b"k2"),
            bytearray(b'{"id": 2, "v": "b"}'),
            "t",
            1,
            101,
        ),
    ]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset bigint"
    )


class TestSourceOptions:
    def test_subscribe_mapping(self):
        opts = kafka_source_options(
            {
                "bootstrap_servers": "b1:9092,b2:9092",
                "subscribe": "events,clicks",
                "starting_offsets": "earliest",
                "max_offsets_per_trigger": 50000,
                "fail_on_data_loss": False,
            }
        )
        assert opts == {
            "kafka.bootstrap.servers": "b1:9092,b2:9092",
            "subscribe": "events,clicks",
            "startingOffsets": "earliest",
            "maxOffsetsPerTrigger": "50000",
            "failOnDataLoss": "false",
        }

    def test_pattern_and_assign_map_to_spark_names(self):
        assert "subscribePattern" in kafka_source_options(
            {"bootstrap_servers": "b:9092", "subscribe_pattern": "ev.*"}
        )
        assert "assign" in kafka_source_options(
            {"bootstrap_servers": "b:9092", "assign": '{"t":[0,1]}'}
        )

    def test_raw_options_passthrough_wins(self):
        opts = kafka_source_options(
            {
                "bootstrap_servers": "b:9092",
                "subscribe": "t",
                "options": {"kafka.security.protocol": "SSL", "subscribe": "u"},
            }
        )
        assert opts["kafka.security.protocol"] == "SSL"
        assert opts["subscribe"] == "u"

    def test_validation(self):
        with pytest.raises(ValueError, match="bootstrap_servers"):
            kafka_source_options({"subscribe": "t"})
        with pytest.raises(ValueError, match="exactly one"):
            kafka_source_options({"bootstrap_servers": "b"})
        with pytest.raises(ValueError, match="exactly one"):
            kafka_source_options(
                {"bootstrap_servers": "b", "subscribe": "t", "assign": "x"}
            )

    def test_sink_validation_and_mapping(self):
        with pytest.raises(ValueError, match="topic"):
            kafka_sink_options({"bootstrap_servers": "b"})
        opts = kafka_sink_options(
            {"bootstrap_servers": "b:9092", "topic": "out"}
        )
        assert opts == {"kafka.bootstrap.servers": "b:9092", "topic": "out"}


class TestValueTransforms:
    def test_decode_json_hoists_fields_and_keeps_offsets(self, spark):
        out = decode_kafka_value(
            _kafka_like(spark), schema="id INT, v STRING", value_format="json"
        )
        rows = sorted(out.collect(), key=lambda r: r["id"])
        assert out.columns == ["key", "id", "v", "topic", "partition", "offset"]
        assert (rows[0]["key"], rows[0]["id"], rows[0]["v"]) == ("k1", 1, "a")
        assert rows[1]["offset"] == 101

    def test_decode_string_cast_only(self, spark):
        out = decode_kafka_value(_kafka_like(spark), keep_metadata=False)
        assert out.columns == ["key", "value"]
        vals = {r["value"] for r in out.collect()}
        assert '{"id": 1, "v": "a"}' in vals

    def test_decode_json_requires_schema(self, spark):
        with pytest.raises(ValueError, match="schema"):
            decode_kafka_value(_kafka_like(spark), value_format="json")

    def test_schema_with_string_format_raises(self, spark):
        # ADVICE r6: a schema alongside value_format='string' used to be
        # silently ignored — the user's DDL was dropped.
        with pytest.raises(ValueError, match="ignore"):
            decode_kafka_value(
                _kafka_like(spark), schema="id INT", value_format="string"
            )

    def test_hoisted_field_collision_raises(self, spark):
        # ADVICE r6: a JSON payload field named 'offset' (or key/topic/
        # partition) would produce duplicate column names downstream.
        with pytest.raises(ValueError, match="collide"):
            decode_kafka_value(
                _kafka_like(spark),
                schema="id INT, offset BIGINT",
                value_format="json",
            )
        # keep_metadata=False frees the metadata names (key stays reserved)
        out = decode_kafka_value(
            _kafka_like(spark),
            schema="id INT, offset BIGINT",
            value_format="json",
            keep_metadata=False,
        )
        assert out.columns == ["key", "id", "offset"]
        with pytest.raises(ValueError, match="collide"):
            decode_kafka_value(
                _kafka_like(spark),
                schema="key STRING, id INT",
                value_format="json",
                keep_metadata=False,
            )

    def test_encode_decode_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 2.5), (2, "b", 3.5)], "id INT, v STRING, x DOUBLE"
        )
        wire = encode_kafka_value(df, key="id")
        assert wire.columns == ["key", "value"]
        # simulate the broker: string -> binary, add metadata cols
        transported = wire.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit("t").alias("topic"),
            F.lit(0).alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
        )
        back = decode_kafka_value(
            transported, schema="v STRING, x DOUBLE", value_format="json"
        )
        rows = sorted(back.collect(), key=lambda r: r["key"])
        assert (rows[0]["key"], rows[0]["v"], rows[0]["x"]) == ("1", "a", 2.5)
        assert (rows[1]["key"], rows[1]["v"], rows[1]["x"]) == ("2", "b", 3.5)

    def test_encode_is_narrow(self, spark):
        # wire-shaping must stay a pure projection — no shuffle at any SF
        df = spark.createDataFrame([(1, "a")], "id INT, v STRING")
        plan = encode_kafka_value(df, key="id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestConnectorAbsent:
    def test_read_source_error_is_actionable(self, spark):
        with pytest.raises(RuntimeError, match="--packages"):
            read_source(
                spark,
                {
                    "format": "kafka",
                    "bootstrap_servers": "b:9092",
                    "subscribe": "t",
                    "stream": False,
                },
            )


_BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not _BOOTSTRAP,
    reason="set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 (broker + "
    "spark-sql-kafka connector on the classpath) to run the end-to-end "
    "kafka path (VERDICT r6 item 4)",
)
class TestBrokerEndToEnd:
    """Exercises the ~30 broker-touching lines (load/start) that the
    sandbox cannot: write a batch of JSON records through the kafka
    sink spec, read them back through the source spec (bounded batch
    read + streaming read), and check the decode round-trip."""

    def test_batch_roundtrip(self, spark):
        from etl_framework_spark.sources.readers import write_sink

        topic = f"sg_e2e_{uuid.uuid4().hex[:8]}"
        df = spark.createDataFrame(
            [(1, "a", 2.5), (2, "b", 3.5)], "id INT, v STRING, x DOUBLE"
        )
        write_sink(
            df,
            {
                "format": "kafka",
                "bootstrap_servers": _BOOTSTRAP,
                "topic": topic,
                "key": "id",
            },
        )
        back = read_source(
            spark,
            {
                "format": "kafka",
                "bootstrap_servers": _BOOTSTRAP,
                "subscribe": topic,
                "stream": False,
                "starting_offsets": "earliest",
                "schema": "v STRING, x DOUBLE",
            },
        )
        rows = sorted(back.collect(), key=lambda r: r["key"])
        assert [(r["key"], r["v"], r["x"]) for r in rows] == [
            ("1", "a", 2.5),
            ("2", "b", 3.5),
        ]

    def test_stream_read_memory_sink(self, spark, tmp_path):
        from etl_framework_spark.sources.readers import write_sink

        topic = f"sg_e2e_{uuid.uuid4().hex[:8]}"
        df = spark.createDataFrame([(7, "z")], "id INT, v STRING")
        write_sink(
            df,
            {
                "format": "kafka",
                "bootstrap_servers": _BOOTSTRAP,
                "topic": topic,
                "key": "id",
            },
        )
        stream = read_source(
            spark,
            {
                "format": "kafka",
                "bootstrap_servers": _BOOTSTRAP,
                "subscribe": topic,
                "starting_offsets": "earliest",
                "schema": "v STRING",
            },
        )
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName(f"mem_{topic}")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql(f"SELECT key, v FROM mem_{topic}").collect()
        assert [(r["key"], r["v"]) for r in got] == [("7", "z")]
