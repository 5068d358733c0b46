"""Streaming equivalence (SURVEY.md §5.4): replay events.parquet
through readStream + AvailableNow and assert convergence to the batch
answer; exercise watermarks, streaming dedup, and stateful
applyInPandasWithState."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.queries.streaming_q import session_transform, tumbling_transform
from etl_framework_spark.streaming import replay_events
from tests.conftest import SF_SMALL


def _canon(df):
    return sorted(map(str, df.collect()))


def test_tumbling_stream_equals_batch(spark):
    batch = tumbling_transform(table(spark, SF_SMALL, "events"))
    stream = replay_events(spark, SF_SMALL, tumbling_transform, "complete")
    assert _canon(stream) == _canon(batch)


def test_session_stream_equals_batch(spark):
    batch = session_transform(table(spark, SF_SMALL, "events"))
    stream = replay_events(spark, SF_SMALL, session_transform, "complete")
    assert _canon(stream) == _canon(batch)


def test_watermarked_dedup_converges(spark):
    """T4/T5: watermark + dropDuplicates on replay covers every key
    exactly once (events are unique per event_id, so count == batch)."""

    def dedup(ev):
        return ev.withWatermark("ts", "1 hour").dropDuplicates(["user_id", "event_type"])

    stream = replay_events(spark, SF_SMALL, dedup, "append")
    batch_keys = (
        table(spark, SF_SMALL, "events").select("user_id", "event_type").distinct().count()
    )
    assert stream.count() == batch_keys
    assert stream.select("user_id", "event_type").distinct().count() == batch_keys


def test_stateful_apply_in_pandas_with_state(spark):
    """T6: real streaming state — per-user running counters via
    applyInPandasWithState; final update equals the batch group count."""
    try:
        from pyspark.sql.streaming.state import GroupStateTimeout
    except ImportError:
        pytest.skip("applyInPandasWithState state API not available")

    def count_state(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def transform(ev):
        return ev.groupBy("user_id").applyInPandasWithState(
            count_state,
            outputStructType="user_id bigint, n_events bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    stream = replay_events(spark, SF_SMALL, transform, "update")
    # keep the last update per user (AvailableNow may run several batches)
    final = {r.user_id: r.n_events for r in stream.collect()}
    batch = {
        r.user_id: r.n
        for r in table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == batch


def test_stateful_transform_with_state_in_pandas(spark):
    """T6 twin (VERDICT r6 item 6): the Spark 4
    transformWithStateInPandas API — per-user running counters via a
    StatefulProcessor ValueState; the last update per user must equal
    the batch group count, and must agree with the
    applyInPandasWithState formulation above."""
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
    except ImportError:
        pytest.skip("transformWithStateInPandas API not available")
    # The transformWithState Python state-server protocol rides on
    # protobuf (pyspark.sql.streaming.proto) — absent/broken in this
    # sandbox. Probe it up front so the skip is clean instead of a
    # crashed driver-worker StreamingQueryException mid-query.
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "google.protobuf unavailable: transformWithStateInPandas "
            "state-server protocol cannot start in this environment"
        )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    def transform(ev):
        return ev.groupBy("user_id").transformWithStateInPandas(
            CountProcessor(),
            outputStructType="user_id bigint, n_events bigint",
            outputMode="update",
            timeMode="none",
        )

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = replay_events(spark, SF_SMALL, transform, "update")
        final = {r.user_id: r.n_events for r in stream.collect()}
    except Exception as e:  # pragma: no cover — env-dependent backend
        if "RocksDB" in str(e) or "UnsatisfiedLink" in str(e):
            pytest.skip(f"RocksDB state store unavailable: {e}")
        raise
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    batch = {
        r.user_id: r.n
        for r in table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == batch


def test_stream_stream_join_converges(spark):
    """T7 full form: watermarked stream-stream inner join (views ⋈
    purchases per user within [t_view, t_view+1h]) must converge to
    the batch interval-join answer on replay."""
    from etl_framework_spark.streaming.harness import events_stream

    def batch_pairs():
        ev = table(spark, SF_SMALL, "events").withColumn(
            "tts", F.date_trunc("second", F.col("ts"))
        )
        v = ev.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("vid"), F.col("user_id").alias("vu"), F.col("tts").alias("vt")
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("tts").alias("pt")
        )
        return v.join(
            p,
            (F.col("vu") == F.col("pu"))
            & (F.col("pt") >= F.col("vt"))
            & (F.col("pt") < F.col("vt") + F.expr("INTERVAL 1 HOUR")),
        ).select("vid", "pid")

    import uuid

    src = events_stream(spark, SF_SMALL).withColumn(
        "tts", F.date_trunc("second", F.col("ts"))
    )
    v = (
        src.filter(F.col("event_type") == "view")
        .select(F.col("event_id").alias("vid"), F.col("user_id").alias("vu"), F.col("tts").alias("vt"))
        .withWatermark("vt", "2 hours")
    )
    p = (
        src.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("pid"), F.col("user_id").alias("pu"), F.col("tts").alias("pt"))
        .withWatermark("pt", "2 hours")
    )
    joined = v.join(
        p,
        (F.col("vu") == F.col("pu"))
        & (F.col("pt") >= F.col("vt"))
        & (F.col("pt") < F.col("vt") + F.expr("INTERVAL 1 HOUR")),
    ).select("vid", "pid")
    name = f"ss_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.vid, r.pid) for r in spark.table(name).collect()}
    want = {(r.vid, r.pid) for r in batch_pairs().collect()}
    assert got == want and len(want) > 0


def test_rate_source_smoke(spark):
    """S8: the rate source produces rows through the streaming engine."""
    import uuid

    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        deadline = time.time() + 20
        while spark.table(name).count() == 0 and time.time() < deadline:
            time.sleep(0.5)
            q.processAllAvailable()
        assert spark.table(name).count() > 0
        cols = set(spark.table(name).columns)
        assert cols == {"timestamp", "value"}
    finally:
        q.stop()


def test_stateful_transform_with_state(spark):
    """T6 (Spark 4 API): per-user running counters via
    transformWithStateInPandas + a StatefulProcessor — the successor
    to applyInPandasWithState, backed by the RocksDB state store."""
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
        # the TWS state-server protocol needs a functional protobuf
        # runtime in the Python worker; absent -> worker crash
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas needs protobuf runtime")

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def transform(ev):
            return ev.groupBy("user_id").transformWithStateInPandas(
                CountProcessor(),
                outputStructType="user_id bigint, n_events bigint",
                outputMode="Update",
                timeMode="None",
            )

        stream = replay_events(spark, SF_SMALL, transform, "update")
        final = {r.user_id: r.n_events for r in stream.collect()}
        batch = {
            r.user_id: r.n
            for r in table(spark, SF_SMALL, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert final == batch
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_watermark_drops_late_data(spark, tmp_path):
    """T4 proper: an event arriving BEHIND the watermark is dropped.
    Three single-file micro-batches (maxFilesPerTrigger=1, oldest
    first): batch 1 fills window 10:00 and advances event time to
    11:00 (watermark 10:50 after commit); batch 2 carries a 10:02
    straggler — behind the watermark, must be dropped — plus an 11:30
    row; batch 3 only pushes the watermark so window 11:00 finalizes.
    Append-mode windowed counts must show the straggler missing."""
    import time as _time
    import uuid as _uuid

    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "user_id"])
        # µs precision: pandas' default ns parquet type needs a conf to read
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src / f"{name}.parquet")
        _time.sleep(1.1)  # distinct mtimes => deterministic file order

    write_batch(
        "b1",
        [("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 2),
         ("2024-01-01 11:00:00", 3)],
    )

    stream = spark.readStream.schema("ts timestamp, user_id long").parquet(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = f"late_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 commits; watermark -> 10:50
        write_batch(
            "b2",
            [("2024-01-01 10:02:00", 4),  # late: behind the 10:50 watermark
             ("2024-01-01 11:30:00", 5)],
        )
        q.processAllAvailable()  # drops the straggler, watermark -> 11:20
        write_batch("b3", [("2024-01-01 12:30:00", 6)])
        q.processAllAvailable()  # finalizes window 11:00
    finally:
        q.stop()
    got = {r.ws.strftime("%H:%M"): r.n for r in spark.table(name).collect()}
    assert got["10:00"] == 2, f"late row leaked into finalized window: {got}"
    assert got["11:00"] == 1


def test_rocksdb_state_store_backend(spark, tmp_path):
    """The production state-store backend: the same windowed
    aggregation runs with RocksDB-backed state (what a 100 TB
    cluster uses for billions of keys) and converges to the batch
    answer."""
    import uuid as _uuid

    from etl_framework_spark.streaming.harness import events_stream

    name = f"rocks_{_uuid.uuid4().hex[:8]}"
    q = (
        events_stream(spark, SF_SMALL)
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .option(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name).agg(F.sum("n")).collect()[0][0]
    batch = table(spark, SF_SMALL, "events").count()
    assert got == batch


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill-and-restart recovery (VERDICT r5 item 8): a STATEFUL
    dedup stream writes half the input to a checkpointed file sink,
    stops, the other half (heavily overlapping dedup keys) arrives,
    and a NEW query restarted from the same checkpoint must (a) not
    reprocess the consumed files and (b) recover the dedup state, so
    the final sink equals the batch-distinct answer exactly once.
    If source offsets were lost, half-1 rows would duplicate; if
    operator state were lost, half-1's (user, event_type) pairs would
    be re-emitted by half-2 rows."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    half1 = ev.filter(F.col("event_id") <= mid)
    half2 = ev.filter(F.col("event_id") > mid)
    # the recovery signal: half-2 shares almost every dedup key with
    # half-1 (every user emits every event type throughout the day)
    schema = "event_id bigint, user_id bigint, event_type string, value double"

    def run_to_completion() -> None:
        q = (
            spark.readStream.schema(schema)
            .parquet(in_dir)
            .dropDuplicates(["user_id", "event_type"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    half1.coalesce(1).write.mode("overwrite").parquet(in_dir)
    run_to_completion()  # run 1: consumes half 1, then "dies"
    n_after_half1 = spark.read.parquet(out_dir).count()
    assert n_after_half1 == half1.select("user_id", "event_type").distinct().count()

    half2.coalesce(1).write.mode("append").parquet(in_dir)
    run_to_completion()  # run 2: restart from the same checkpoint

    out = spark.read.parquet(out_dir)
    expected = ev.select("user_id", "event_type").distinct().count()
    assert out.count() == expected  # exactly once, state recovered
    assert (
        out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count()
        == 0
    )
    # and recovery genuinely exercised cross-restart state: half 2
    # re-sent keys half 1 already emitted, yet none were duplicated —
    # impossible unless the dedup state survived the restart
    overlap = (
        half2.select("user_id", "event_type")
        .distinct()
        .join(half1.select("user_id", "event_type").distinct(),
              ["user_id", "event_type"])
        .count()
    )
    assert overlap > 0
    assert out.count() >= n_after_half1
