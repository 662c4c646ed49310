"""Streaming equivalence tests (SURVEY §5.2 layer 3, §2.10 ST1-ST8).

Replay the events fixture through a file-source stream (one parquet file
per micro-batch) and assert the streaming result equals the batch twin.
Late-data cases feed out-of-ts-order micro-batches.
"""

from __future__ import annotations

import datetime
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from paraslice_spark.sources.io import load_tables
from paraslice_spark.streaming import batch_twins, streams
from tests.conftest import SF_SMALL


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def events_dir(tmp_path):
    """Directory with the sf0.001 events parquet as a single stream file."""
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", d / "part-000.parquet")
    return str(d)


def _mem_name() -> str:
    return "mem_" + uuid.uuid4().hex[:8]


def test_st1_tumbling_stream_equals_batch(spark, events_dir):
    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(batch_twins.tumbling_counts(stream), name)
    got = _rows(spark.table(name), "hour_start", "n_events", "sum_value")
    want = _rows(
        batch_twins.tumbling_counts(load_tables(spark, SF_SMALL)["events"]),
        "hour_start",
        "n_events",
        "sum_value",
    )
    assert got == want and len(got) > 0


def test_st3_session_stream_equals_batch(spark, events_dir):
    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(batch_twins.session_windows(stream), name)
    got = _rows(spark.table(name), "session_start", "user_id", "n_events")
    want = _rows(
        batch_twins.session_windows(load_tables(spark, SF_SMALL)["events"]),
        "session_start",
        "user_id",
        "n_events",
    )
    assert got == want and len(got) > 0


def _write_batch(spark, directory, idx, rows):
    """Write one micro-batch parquet file in the fixture's on-disk shape
    (ts = µs timestamp, no tz → parquet isAdjustedToUTC=0, read as NTZ).
    Rows still pass ts as ns longs for caller convenience.

    FileStreamSource orders files by modification time; set mtimes
    explicitly so micro-batch replay order is deterministic.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(directory, exist_ok=True)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array([v // 1000 for v in cols[1]], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    path = f"{directory}/batch-{idx:03d}.parquet"
    pq.write_table(table, path)
    t = 1_700_000_000 + idx * 60
    os.utime(path, (t, t))


def _ns(minutes: int) -> int:
    base = int(datetime.datetime(2024, 6, 1).timestamp()) * 1_000_000_000
    return base + minutes * 60 * 1_000_000_000


def test_st4_watermark_drops_late_rows(spark, tmp_path):
    """Semantics verified on Spark 4.1.2: a late row is dropped once the
    watermark has passed its window AND that window's state was evicted in
    an earlier micro-batch (eviction happens at the start of the first
    batch whose watermark exceeds the window end; a late row arriving in
    that same batch still merges — observed via numRowsDroppedByWatermark).
    """
    d = str(tmp_path / "late")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(120), 1, "click", 1.0, "{}")])  # wm -> 01:50
    _write_batch(spark, d, 2, [(3, _ns(150), 1, "click", 1.0, "{}")])  # evicts hour-0
    _write_batch(spark, d, 3, [(4, _ns(5), 1, "click", 1.0, "{}")])  # late -> dropped
    _write_batch(spark, d, 4, [(5, _ns(300), 1, "click", 1.0, "{}")])  # flush

    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    agg = streams.watermarked_tumbling(stream, "10 minutes")
    name = _mem_name()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    rows = _rows(spark.table(name), "hour_start", "n_events")
    hour0 = [r for r in rows if r[0] == datetime.datetime(2024, 6, 1, 0, 0)]
    # hour-0 emitted exactly once, with only the on-time event
    assert hour0 == [(datetime.datetime(2024, 6, 1, 0, 0), 1)], rows
    assert dropped == 1, (dropped, rows)


def test_st34_session_watermark_drop_splits_session(spark, tmp_path):
    """SESSION window x watermark (the events_session_watermark_audit
    streaming twin), semantics verified on Spark 4.1.2: session state is
    emitted+evicted at the start of the first batch processed under a
    watermark past its end (the ST4 lag-one rule applied to sessions),
    and a late row arriving AFTER that eviction drops (observed via
    numRowsDroppedByWatermark) - the session it would have extended
    stays short.  Arrival: u1@0:00, u1@0:20 (merge to [0:00,0:50)),
    u2@3:00 (wm -> 2:50), u2@3:05 (first batch under the new wm: u1's
    session emits), u1@0:40 late (state gone, window end 1:10 < wm ->
    DROPPED, not merged), u2@6:00 (flush)."""
    d = str(tmp_path / "sess_late")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(20), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 2, [(3, _ns(180), 2, "click", 1.0, "{}")])
    _write_batch(spark, d, 3, [(6, _ns(185), 2, "click", 1.0, "{}")])
    _write_batch(spark, d, 4, [(4, _ns(40), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 5, [(5, _ns(360), 2, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    agg = streams.watermarked_sessions(stream)
    name = _mem_name()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    got = _rows(
        spark.table(name), "session_start", "session_end", "user_id", "n_events"
    )
    base = datetime.datetime(2024, 6, 1)

    def t(m):
        return base + datetime.timedelta(minutes=m)

    # u1's session emitted WITHOUT the late 0:40 row (end stays 0:50);
    # u2's 3:00/3:05 pair merged and emitted after the flush
    assert got == [(t(0), t(50), 1, 2), (t(180), t(215), 2, 2)], got
    assert dropped == 1, dropped


def test_st34_same_batch_coalescing_rescues_late_row(spark, tmp_path):
    """The MERGE-RESCUE divergence the declared audit's docstring states
    it does not model, pinned executable: the same late u1@0:40 row
    arriving in the SAME micro-batch as the watermark-advancing u2@3:00
    row is processed under the PREVIOUS batch's watermark (0:10), so it
    merges into u1's still-open session ([0:00,1:10), 3 events) instead
    of dropping - Spark advances the watermark at batch boundaries,
    while the batch audit models a per-event (per-arrival) watermark,
    making the declared rule the conservative bound on loss."""
    d = str(tmp_path / "sess_rescue")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(20), 1, "click", 1.0, "{}")])
    _write_batch(
        spark,
        d,
        2,
        [
            (3, _ns(180), 2, "click", 1.0, "{}"),
            (4, _ns(40), 1, "click", 1.0, "{}"),
        ],
    )
    _write_batch(spark, d, 3, [(5, _ns(360), 2, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    agg = streams.watermarked_sessions(stream)
    name = _mem_name()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    got = _rows(
        spark.table(name), "session_start", "session_end", "user_id", "n_events"
    )
    base = datetime.datetime(2024, 6, 1)

    def t(m):
        return base + datetime.timedelta(minutes=m)

    assert got == [(t(0), t(70), 1, 3), (t(180), t(210), 2, 1)], got
    assert dropped == 0, dropped


def test_st35_update_mode_sessions_rejected(spark, tmp_path):
    """The one impossible sink-mode × window-type cell, pinned as the
    engine's own error: session-window aggregation rejects UPDATE output
    mode at analysis (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION on
    Spark 4.1.2), which is why the declared session column is
    append (rows-only) / complete (hash-oracled) only."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    d = str(tmp_path / "sess_upd")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    agg = streams.watermarked_sessions(stream)
    with pytest.raises(AnalysisException, match="STREAMING_OUTPUT_MODE"):
        (
            agg.writeStream.format("memory")
            .queryName(_mem_name())
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )


def test_st35_complete_mode_session_semantics(spark, tmp_path):
    """The engine behaviors the stream_session_complete_replay oracle
    models, pinned on crafted batches (Spark 4.1.2, complete mode,
    wm 10 min / gap 30 min):

    - the late filter is PER ROW against the lag-2 watermark, with no
      in-batch merge rescue: u1@2:10 (end 2:40 < wm_3 2:50) drops even
      though it overlaps kept u1@2:25 in the SAME batch;
    - the boundary is >= : u2@2:25:00.000 (end 2:55:00.000 == wm_4)
      drops, u4@2:25:00.001 (end 1 ms past the watermark) survives —
      which also pins the operative watermark as the LAG-2 stats
      (lag-1 would be 2:55 and drop the control row too);
    - complete mode never evicts session state (numRowsRemoved == 0)
      and the final emission carries every session ever formed from
      surviving rows (u1's batch-0 session, long past the watermark,
      is still present) — unlike tumbling complete, drops are LIVE."""
    d = str(tmp_path / "sess_complete")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(180), 3, "click", 1.0, "{}")])
    _write_batch(spark, d, 2, [(3, _ns(185), 3, "click", 1.0, "{}")])
    # wm_3 = lag-2 stats (through b1: max 3:00) - 10 min = 2:50
    _write_batch(
        spark, d, 3,
        [
            (4, _ns(130), 1, "click", 1.0, "{}"),  # end 2:40 < 2:50: drop
            (5, _ns(145), 1, "click", 1.0, "{}"),  # end 2:55 > 2:50: keep
        ],
    )
    # wm_4 = lag-2 stats (through b2: max 3:05) - 10 min = 2:55
    _write_batch(
        spark, d, 4,
        [
            (6, _ns(145), 2, "click", 1.0, "{}"),        # end == wm: drop
            (7, _ns(145) + 1_000_000, 4, "click", 1.0, "{}"),  # +1 ms: keep
        ],
    )
    _write_batch(spark, d, 5, [(8, _ns(360), 3, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    agg = streams.watermarked_sessions(stream)
    name = _mem_name()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    removed = sum(
        so.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    got = _rows(
        spark.table(name), "session_start", "session_end", "user_id", "n_events"
    )
    base = datetime.datetime(2024, 6, 1)

    def t(m, ms=0):
        return base + datetime.timedelta(minutes=m, milliseconds=ms)

    assert got == [
        (t(0), t(30), 1, 1),          # batch-0 session survives complete
        (t(145), t(175), 1, 1),       # kept despite its dropped batchmate
        (t(145, 1), t(175, 1), 4, 1),  # 1 ms past the boundary survives
        (t(180), t(215), 3, 2),
        (t(360), t(390), 3, 1),
    ], got
    assert dropped == 2, dropped
    assert removed == 0, removed


def test_st5_dedup_within_watermark(spark, tmp_path):
    d = str(tmp_path / "dup")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(1, _ns(1), 1, "click", 1.0, "{}")])  # dup id
    _write_batch(spark, d, 2, [(2, _ns(2), 1, "view", 2.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.dedup_within_watermark(stream), name, "append")
    ids = sorted(r["event_id"] for r in spark.table(name).collect())
    assert ids == [1, 2]


def test_st6_stateful_running_count(spark, tmp_path):
    d = str(tmp_path / "state")
    _write_batch(spark, d, 0, [(1, _ns(0), 7, "click", 1.0, "{}"),
                               (2, _ns(1), 7, "view", 1.0, "{}")])
    _write_batch(spark, d, 1, [(3, _ns(2), 7, "click", 1.0, "{}"),
                               (4, _ns(3), 8, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.running_count_per_user(stream), name, "update")
    rows = spark.table(name).collect()
    # final state per user: user 7 saw 3 events, user 8 saw 1
    final = {}
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["n_events"])
    assert final == {7: 3, 8: 1}, rows


def test_st7_stream_static_join(spark, events_dir):
    stream = streams.events_file_stream(spark, events_dir)
    cust = load_tables(spark, SF_SMALL)["customer"]
    name = _mem_name()
    streams.run_to_memory(streams.stream_static_join(stream, cust), name, "append")
    got = spark.table(name)
    want = streams.stream_static_join(load_tables(spark, SF_SMALL)["events"], cust)
    assert _rows(got, "event_id", "c_nationkey") == _rows(want, "event_id", "c_nationkey")
    assert got.count() > 0


def test_foreachbatch_partitioned_sink(spark, tmp_path, events_dir):
    """ST8+S4: stream → foreachBatch → partitioned parquet sink; read-back
    equals the batch aggregation and the sink is partition-pruned."""
    out = str(tmp_path / "hourly_sink")
    stream = streams.events_file_stream(spark, events_dir)
    agg = batch_twins.tumbling_counts(stream).withColumn(
        "date", F.to_date("hour_start")
    )

    def write_batch(df, _batch_id):
        df.write.mode("overwrite").partitionBy("date").parquet(out)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    want = batch_twins.tumbling_counts(load_tables(spark, SF_SMALL)["events"])
    assert back.count() == want.count()
    # partition-pruned read of one day: nonempty, at most 24 hourly rows
    day = back.where("date = '2024-01-15'").collect()
    assert 0 < len(day) <= 24


def test_checkpoint_recovery_no_duplicates(spark, tmp_path):
    """Kill a checkpointed query between micro-batches, add more data,
    restart from the checkpoint: every input row counted exactly once."""
    d = str(tmp_path / "recov")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}"),
                               (2, _ns(1), 2, "click", 1.0, "{}")])
    name = _mem_name()

    def start():
        stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
        counts = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        return (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination()
    q.stop()
    _write_batch(spark, d, 1, [(3, _ns(2), 1, "view", 1.0, "{}")])
    q2 = start()
    q2.awaitTermination()
    got = {r["user_id"]: r["n"] for r in spark.table(name).collect()}
    assert got == {1: 2, 2: 1}, got


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Stream-stream inner join with watermarks + time-bound condition:
    clicks within 1h before each same-user purchase. Inner joins emit as
    matches arrive, so availableNow processing equals the batch join."""

    def joined(p, c):
        pp = p.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        cc = c.where(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        return pp.join(
            cc,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("interval 1 hour"))
            & (F.col("c_ts") <= F.col("p_ts")),
        ).select("purchase_id", "click_id")

    s1 = streams.events_file_stream(spark, events_dir).withWatermark("ts", "1 hour")
    s2 = streams.events_file_stream(spark, events_dir).withWatermark("ts", "1 hour")
    name = _mem_name()
    streams.run_to_memory(joined(s1, s2), name, "append")
    ev = load_tables(spark, SF_SMALL)["events"]
    got = _rows(spark.table(name), "purchase_id", "click_id")
    want = _rows(joined(ev, ev), "purchase_id", "click_id")
    assert got == want and len(got) > 0


def test_st9_stream_asof_join_equals_batch_twin(spark, tmp_path):
    """ST9: stream-stream AS-OF join (applyInPandasWithState) replay equals
    the batch twin.  Batch 0 carries the whole fixture; two far-future
    sentinel clicks in later micro-batches push the watermark past every
    real purchase (the second forces one more batch so EventTimeTimeout
    drains pending state even if no no-data batch runs)."""
    import os

    d = str(tmp_path / "asof")
    os.makedirs(d)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{d}/batch-000.parquet")
    os.utime(f"{d}/batch-000.parquet", (1_700_000_000, 1_700_000_000))
    # ~2025-03 and later — far beyond the 2024 fixture range
    _write_batch(spark, d, 1, [(10_000_001, _ns(400_000), 1, "click", 0.0, "{}")])
    _write_batch(spark, d, 2, [(10_000_002, _ns(500_000), 1, "click", 0.0, "{}")])

    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    p = stream.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    c = stream.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    name = _mem_name()
    streams.run_to_memory(
        streams.stream_asof_join(streams.tag_asof_streams(p, c)), name, "append"
    )
    got = _rows(spark.table(name), "purchase_id", "user_id", "click_id")

    ev = load_tables(spark, SF_SMALL)["events"]
    bp = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    bc = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    want = _rows(
        batch_twins.asof_lookback(bp, bc, streams.ASOF_LOOKBACK_US),
        "purchase_id",
        "user_id",
        "click_id",
    )
    assert got == want and len(got) > 0
    # lookback actually bites: some purchases matched, some nulled
    matched = [r for r in got if r[2] is not None]
    assert 0 < len(matched) < len(got)


def test_kafka_parse_stage_repairs_ts(spark):
    """Kafka wiring (VERDICT r01 #8): the value-parse stage on a batch
    kafka-shaped frame — same ns->µs integer repair as the file sources;
    malformed payloads null out instead of failing the query."""
    import json

    payload = {"event_id": 7, "ts": 1717200000123456789, "user_id": 3,
               "event_type": "click", "value": 1.5, "props": "{}"}
    kafka_shaped = spark.createDataFrame(
        [
            (None, json.dumps(payload).encode(), "events", 0, 42, None, 1),
            (None, b"not json", "events", 0, 43, None, 1),
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    out = streams.parse_kafka_events(kafka_shaped).orderBy("_kafka_offset").collect()
    assert out[0]["event_id"] == 7 and out[0]["user_id"] == 3
    # integer div 1000: ...456789 ns -> ...456 µs exactly
    assert out[0]["ts"] == datetime.datetime(2024, 6, 1, 0, 0, 0, 123456)
    assert out[0]["ts_ns"] == 1717200000123456789
    assert out[1]["event_id"] is None  # malformed -> null row, query survives
    assert [r["_kafka_offset"] for r in out] == [42, 43]


def test_kafka_source_wiring_raises_without_connector(spark):
    """The container has no spark-sql-kafka jar: the reader must surface
    Spark's DATA_SOURCE_NOT_FOUND (not silently fall back). If a connector
    is ever on the classpath this becomes a live plan-shape check instead."""
    try:
        df = streams.kafka_events_stream(spark, "broker:9092", "events")
    except Exception as ex:
        assert "KAFKA" in str(ex).upper() or "DATA_SOURCE" in str(ex).upper(), ex
    else:
        # connector present: the parse stage must be wired over the source
        assert df.isStreaming and "ts_ns" in df.columns


def test_st8_output_modes_complete_vs_update(spark, tmp_path):
    d = str(tmp_path / "modes")
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(61), 1, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = _mem_name()
    streams.run_to_memory(counts, name, "complete")
    rows = _rows(spark.table(name), "event_type", "n")
    assert rows == [("click", 2)]


def test_st9_tws_plan_builds(spark):
    """ST9 state-v2 twin, container-safe part: the
    transformWithStateInPandas plan constructs (analysis succeeds, output
    schema is the ST9 contract) without starting the query — execution
    needs google.protobuf, which this container does not ship."""
    ev = load_tables(spark, SF_SMALL)["events"]
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    c = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    df = streams.stream_asof_join_tws(streams.tag_asof_streams(p, c))
    assert [f.name for f in df.schema.fields] == ["purchase_id", "user_id", "click_id"]
    assert "transformwithstate" in df._jdf.queryExecution().analyzed().toString().lower()


def test_st9_tws_asof_join_equals_v1_and_batch(spark, tmp_path):
    """ST9 state-v2 twin: transformWithStateInPandas as-of join replays to
    the SAME rows as the applyInPandasWithState operator and the batch
    twin. Same feed shape as the v1 test (full fixture + two far-future
    sentinel clicks so timers drain every pending left)."""
    pytest.importorskip(
        "google.protobuf",
        reason="Spark's transform_with_state driver worker requires protobuf",
    )
    import os

    d = str(tmp_path / "asof_tws")
    os.makedirs(d)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{d}/batch-000.parquet")
    os.utime(f"{d}/batch-000.parquet", (1_700_000_000, 1_700_000_000))
    _write_batch(spark, d, 1, [(10_000_001, _ns(400_000), 1, "click", 0.0, "{}")])
    _write_batch(spark, d, 2, [(10_000_002, _ns(500_000), 1, "click", 0.0, "{}")])

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
        p = stream.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        c = stream.where(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        name = _mem_name()
        streams.run_to_memory(
            streams.stream_asof_join_tws(streams.tag_asof_streams(p, c)),
            name,
            "append",
        )
        got = _rows(spark.table(name), "purchase_id", "user_id", "click_id")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    ev = load_tables(spark, SF_SMALL)["events"]
    bp = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    bc = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    want = _rows(
        batch_twins.asof_lookback(bp, bc, streams.ASOF_LOOKBACK_US),
        "purchase_id",
        "user_id",
        "click_id",
    )
    assert got == want and len(got) > 0
    matched = [r for r in got if r[2] is not None]
    assert 0 < len(matched) < len(got)


def test_stream_sessionize_equals_batch_twin(spark, events_dir):
    """Whole-fixture replay through the stateful sessionizer must reproduce
    the batch events_sessionize assignment exactly."""
    import paraslice_spark.operators  # noqa: F401  (populates the registry)
    from paraslice_spark.registry import QUERIES

    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(streams.stream_sessionize(stream), name, "append")
    got = _rows(spark.table(name), "event_id", "user_id", "session_idx")
    want = _rows(
        QUERIES["events_sessionize"](spark, SF_SMALL),
        "event_id", "user_id", "session_idx",
    )
    assert got == want and len(got) > 0


def test_stream_sessionize_incremental_split_replay(spark, tmp_path):
    """Two time-ordered micro-batches must continue session numbering from
    state — including a session that SPANS the batch boundary."""
    d = str(tmp_path / "sess")
    # user 1: events at t=0m,10m (batch 0) then 12m,60m (batch 1):
    # sessions (0,10,12) and (60) -> ordinals 1,1,1,2 with a 30m gap rule
    _write_batch(spark, d, 0, [(1, _ns(0), 1, "click", 1.0, "{}"),
                               (2, _ns(10), 1, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(3, _ns(12), 1, "click", 1.0, "{}"),
                               (4, _ns(60), 1, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.stream_sessionize(stream), name, "append")
    got = _rows(spark.table(name), "event_id", "session_idx")
    assert got == [(1, 1), (2, 1), (3, 1), (4, 2)], got


def test_stream_dedup_incremental_equals_batch_twin(spark, tmp_path):
    """Whole-corpus replay through the stateful incremental dedup must
    reproduce the batch dedup_incremental_fp output row-for-row."""
    import paraslice_spark.operators  # noqa: F401  (populates the registry)
    from paraslice_spark.registry import QUERIES

    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMALL}/documents.parquet", d / "part-000.parquet")
    stream = streams.documents_file_stream(spark, str(d))
    name = _mem_name()
    streams.run_to_memory(streams.stream_dedup_incremental(stream), name, "append")
    got = _rows(spark.table(name), "doc_id", "fp_shingle")
    want = _rows(
        QUERIES["dedup_incremental_fp"](spark, SF_SMALL), "doc_id", "fp_shingle"
    )
    assert got == want and len(got) > 0


def test_stream_dedup_incremental_split_replay(spark, tmp_path):
    """Duplicates arriving in a LATER micro-batch must be suppressed by
    state from the earlier batch (first-arrival-wins across batches)."""
    import paraslice_spark.operators  # noqa: F401
    from paraslice_spark.registry import QUERIES

    docs = load_tables(spark, SF_SMALL)["documents"]
    n = docs.count()
    d = str(tmp_path / "docs_split")
    # three shards in doc_id order -> arrival order == doc_id order
    (docs.where(F.col("doc_id") < n // 3).repartition(1)
         .write.parquet(f"{d}/b0", mode="overwrite"))
    (docs.where((F.col("doc_id") >= n // 3) & (F.col("doc_id") < 2 * n // 3))
         .repartition(1).write.parquet(f"{d}/b1", mode="overwrite"))
    (docs.where(F.col("doc_id") >= 2 * n // 3).repartition(1)
         .write.parquet(f"{d}/b2", mode="overwrite"))
    merged = str(tmp_path / "docs_merged")
    import os
    import pathlib
    os.makedirs(merged)
    for i, b in enumerate(("b0", "b1", "b2")):
        src = next(pathlib.Path(f"{d}/{b}").glob("part-*.parquet"))
        shutil.copy(src, f"{merged}/batch-{i:03d}.parquet")
    stream = streams.documents_file_stream(spark, merged, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.stream_dedup_incremental(stream), name, "append")
    got = _rows(spark.table(name), "doc_id", "fp_shingle")
    want = _rows(
        QUERIES["dedup_incremental_fp"](spark, SF_SMALL), "doc_id", "fp_shingle"
    )
    assert got == want and len(got) > 0


def _funnel_final_rows(spark, name):
    """Latest emission per user from an update-mode memory sink (stage is
    monotone, so max stage = final; equal-stage re-emissions are
    identical rows)."""
    t = spark.table(name)
    w_cols = ["user_id", "t_view", "t_click", "t_purchase", "stage"]
    pdf = t.select(*w_cols).toPandas()
    pdf = pdf.sort_values(["user_id", "stage"]).groupby("user_id").tail(1)
    return sorted(
        (int(r.user_id), int(r.t_view),
         None if r.t_click != r.t_click or r.t_click is None else int(r.t_click),
         None if r.t_purchase != r.t_purchase or r.t_purchase is None else int(r.t_purchase),
         int(r.stage))
        for r in pdf.itertuples()
    )


def test_stream_funnel_equals_batch_twin(spark, events_dir):
    """Whole-fixture replay through the stateful funnel machine must
    reproduce the batch events_funnel_users table exactly."""
    import paraslice_spark.operators  # noqa: F401
    from paraslice_spark.registry import QUERIES

    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(streams.stream_funnel(stream), name, "update")
    got = _funnel_final_rows(spark, name)
    want = sorted(
        (r.user_id, r.t_view, r.t_click, r.t_purchase, r.stage)
        for r in QUERIES["events_funnel_users"](spark, SF_SMALL).collect()
    )
    assert got == want and len(got) > 0


def test_stream_funnel_stage_spans_batch_boundary(spark, tmp_path):
    """A click landing in a LATER micro-batch must advance the stage from
    state (view in batch 0, click in batch 1, purchase in batch 1 but
    before the click -> not counted)."""
    d = str(tmp_path / "funnel")
    _write_batch(spark, d, 0, [(1, _ns(0), 7, "view", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(5), 7, "purchase", 1.0, "{}"),
                               (3, _ns(10), 7, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.stream_funnel(stream), name, "update")
    got = _funnel_final_rows(spark, name)
    # purchase at t=5 precedes the first qualifying click (t=10): stage 2
    assert got == [(7, _ns(0), _ns(10), None, 2)], got


def _with_small_arrow_chunks(spark, n, fn):
    """Run fn() with arrow batches capped at n records so a single user's
    micro-batch rows span multiple chunks inside applyInPandasWithState."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        return fn()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_funnel_correct_across_arrow_chunks(spark, tmp_path):
    """ADVICE r5: a user's rows split across Arrow chunks must still be
    processed in GLOBAL time order.  File order puts the later view first;
    with 2-row chunks a per-chunk sort would latch t_view onto _ns(10)
    instead of the true minimum _ns(0)."""
    d = str(tmp_path / "funnel_chunks")
    _write_batch(spark, d, 0, [(2, _ns(10), 7, "view", 1.0, "{}"),
                               (3, _ns(20), 7, "click", 1.0, "{}"),
                               (1, _ns(0), 7, "view", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d)
    name = _mem_name()
    _with_small_arrow_chunks(
        spark, 2,
        lambda: streams.run_to_memory(streams.stream_funnel(stream), name, "update"),
    )
    got = _funnel_final_rows(spark, name)
    assert got == [(7, _ns(0), _ns(20), None, 2)], got


def test_stream_sessionize_correct_across_arrow_chunks(spark, tmp_path):
    """Same chunk-order hazard for the sessionizer: with 2-row chunks and
    the earliest event arriving in the second chunk, a per-chunk sort
    would assign event 2 (t=10m) to the session OPENED at t=60m."""
    d = str(tmp_path / "sess_chunks")
    _write_batch(spark, d, 0, [(3, _ns(60), 1, "click", 1.0, "{}"),
                               (1, _ns(0), 1, "click", 1.0, "{}"),
                               (2, _ns(10), 1, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d)
    name = _mem_name()
    _with_small_arrow_chunks(
        spark, 2,
        lambda: streams.run_to_memory(streams.stream_sessionize(stream), name, "append"),
    )
    got = _rows(spark.table(name), "event_id", "session_idx")
    assert got == [(1, 1), (2, 1), (3, 2)], got


def test_stream_retention_equals_batch_twin(spark, events_dir):
    """Whole-fixture replay: summing the stream's per-user emissions by
    (cohort_day, day_offset) must reproduce the batch events_retention
    table exactly."""
    import paraslice_spark.operators  # noqa: F401
    from paraslice_spark.registry import QUERIES

    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(streams.stream_retention(stream), name, "append")
    got = _rows(
        spark.table(name).groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("users")),
        "cohort_day", "day_offset", "users",
    )
    want = _rows(
        QUERIES["events_retention"](spark, SF_SMALL),
        "cohort_day", "day_offset", "users",
    )
    assert got == want and len(got) > 0


def test_stream_retention_offset_spans_batch_boundary(spark, tmp_path):
    """A later-day activity arriving in a later micro-batch must emit its
    offset against the cohort latched in state, exactly once."""
    d = str(tmp_path / "retention")
    day = 24 * 60
    _write_batch(spark, d, 0, [(1, _ns(0), 5, "view", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, _ns(3 * day), 5, "click", 1.0, "{}"),
                               (3, _ns(3 * day + 10), 5, "view", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.stream_retention(stream), name, "append")
    got = _rows(spark.table(name), "user_id", "day_offset")
    assert got == [(5, 0), (5, 3)], got  # offset 3 emitted once, not twice


def test_stream_cumulative_distinct_equals_batch_twin(spark, events_dir):
    """Whole-fixture replay must label every event with the same running
    distinct-type count as the batch window_cumulative_distinct."""
    import paraslice_spark.operators  # noqa: F401
    from paraslice_spark.registry import QUERIES

    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(streams.stream_cumulative_distinct(stream), name, "append")
    got = _rows(spark.table(name), "event_id", "user_id", "n_distinct_types")
    want = _rows(
        QUERIES["window_cumulative_distinct"](spark, SF_SMALL),
        "event_id", "user_id", "n_distinct_types",
    )
    assert got == want and len(got) > 0


def test_stream_cumulative_distinct_state_spans_batches(spark, tmp_path):
    """A type first seen in batch 0 must NOT re-count in batch 1; a new
    type must increment from state."""
    d = str(tmp_path / "cumdist")
    _write_batch(spark, d, 0, [(1, _ns(0), 3, "view", 1.0, "{}"),
                               (2, _ns(1), 3, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(3, _ns(2), 3, "view", 1.0, "{}"),
                               (4, _ns(3), 3, "purchase", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.stream_cumulative_distinct(stream), name, "append")
    got = _rows(spark.table(name), "event_id", "n_distinct_types")
    assert got == [(1, 1), (2, 2), (3, 2), (4, 3)], got


def test_stream_decontaminate_equals_batch(spark, tmp_path):
    """Pipeline twin: streaming the train docs (two shards, one per
    micro-batch) through the stream-static decontamination must reproduce
    the batch text_decontaminate rows exactly."""
    from paraslice_spark.operators.text import bench_gram_index
    from paraslice_spark.registry import QUERIES
    from paraslice_spark.sources.io import load_tables

    d = load_tables(spark, SF_SMALL)["documents"]
    train_dir = str(tmp_path / "train_docs")
    # two shards -> two micro-batches; each doc wholly inside one file
    d.where((F.col("source") != "src0") & (F.col("doc_id") % 2 == 0)).coalesce(
        1
    ).write.mode("append").parquet(train_dir)
    d.where((F.col("source") != "src0") & (F.col("doc_id") % 2 == 1)).coalesce(
        1
    ).write.mode("append").parquet(train_dir)

    bench = bench_gram_index(d.where(F.col("source") == "src0"))
    stream = streams.documents_file_stream(spark, train_dir)
    name = "decontam_stream"
    streams.run_to_memory(
        streams.stream_decontaminate(stream, bench), name, "complete"
    )
    got = {
        (r["train_doc"], r["bench_doc"], r["shared_grams"], r["containment"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["train_doc"], r["bench_doc"], r["shared_grams"], r["containment"])
        for r in QUERIES["text_decontaminate"](spark, SF_SMALL).collect()
    }
    assert got == want and len(want) > 0, (got ^ want, len(want))


def _scd2_closed_batch_rows(spark):
    import paraslice_spark.operators  # noqa: F401  (registers the batch twin)
    from paraslice_spark.registry import QUERIES

    return {
        (r["user_id"], r["ver"], r["status"], r["valid_from_ns"],
         r["valid_to_ns"], r["n_events"])
        for r in QUERIES["events_scd2_status"](spark, SF_SMALL).collect()
        if r["valid_to_ns"] is not None  # stream can only emit CLOSED versions
    }


def test_stream_scd2_whole_replay_equals_batch_closed(spark, tmp_path):
    d = str(tmp_path / "ev_all")
    load_tables(spark, SF_SMALL)["events"].coalesce(1).write.parquet(d)
    stream = streams.events_file_stream(spark, d)
    name = "scd2_whole"
    streams.run_to_memory(streams.stream_scd2(stream), name, "append")
    got = {tuple(r) for r in spark.table(name).collect()}
    assert got == _scd2_closed_batch_rows(spark) and got


def test_stream_scd2_split_replay_equals_batch_closed(spark, tmp_path):
    import pathlib
    import shutil

    ev = load_tables(spark, SF_SMALL)["events"]
    mid = ev.approxQuantile("ts_ns", [0.5], 0.0)[0]
    d = str(tmp_path / "ev_split")
    (ev.where(F.col("ts_ns") <= mid).repartition(1)
       .write.parquet(f"{d}/b0", mode="overwrite"))
    (ev.where(F.col("ts_ns") > mid).repartition(1)
       .write.parquet(f"{d}/b1", mode="overwrite"))
    merged = str(tmp_path / "ev_merged")
    import os

    os.makedirs(merged)
    for i, b in enumerate(("b0", "b1")):
        src = next(pathlib.Path(f"{d}/{b}").glob("part-*.parquet"))
        shutil.copy(src, f"{merged}/batch-{i:03d}.parquet")
    stream = streams.events_file_stream(spark, merged, max_files_per_trigger=1)
    name = "scd2_split"
    streams.run_to_memory(streams.stream_scd2(stream), name, "append")
    got = {tuple(r) for r in spark.table(name).collect()}
    assert got == _scd2_closed_batch_rows(spark) and got


def test_stream_user_traffic_equals_batch_counts(spark, events_dir):
    """Whole-fixture replay: each user's MAX emitted running total must
    equal the batch per-user count, and top-20 by (n DESC, user_id) must
    reproduce the declared events_heavy_hitters (user_id, n) table."""
    import paraslice_spark.operators  # noqa: F401
    from paraslice_spark.registry import QUERIES

    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(streams.stream_user_traffic(stream), name, "append")
    got_totals = {
        r["user_id"]: r["mx"]
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n").alias("mx"))
        .collect()
    }
    want_totals = {
        r["user_id"]: r["n"]
        for r in load_tables(spark, SF_SMALL)["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_totals == want_totals and len(got_totals) > 0
    top = sorted(got_totals.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want_top = _rows(
        QUERIES["events_heavy_hitters"](spark, SF_SMALL), "user_id", "n"
    )
    assert sorted(top, key=lambda kv: (-kv[1], kv[0])) == sorted(
        want_top, key=lambda kv: (-kv[1], kv[0])
    )


def test_stream_user_traffic_split_replay(spark, tmp_path):
    """Counts must CONTINUE from state across micro-batches: a user seen
    in both batches emits cumulative totals, not per-batch counts."""
    d = str(tmp_path / "traffic")
    _write_batch(spark, d, 0, [(1, _ns(0), 7, "click", 1.0, "{}"),
                               (2, _ns(1), 7, "click", 1.0, "{}"),
                               (3, _ns(2), 8, "click", 1.0, "{}")])
    _write_batch(spark, d, 1, [(4, _ns(3), 7, "click", 1.0, "{}")])
    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    name = _mem_name()
    streams.run_to_memory(streams.stream_user_traffic(stream), name, "append")
    got = _rows(spark.table(name), "user_id", "n")
    assert got == [(7, 2), (7, 3), (8, 1)], got


def _batch_cms_counters(spark):
    """Batch CMS counter table over the sf0.001 events fixture, via the
    SHARED cms_hash/cms_buckets helpers (the independent anchor for the
    hash rule is agg_countmin_topk_error's DuckDB oracle, which rebuilds
    the counters digit-for-digit in SQL — not a third hand-kept copy
    here)."""
    from paraslice_spark.operators.aggregates import cms_buckets, cms_hash

    ev = load_tables(spark, SF_SMALL)["events"]
    h = ev.select(cms_hash().alias("h"))
    return {
        (r["j"], r["bucket"]): r["cnt"]
        for r in h.select(cms_buckets(F.col("h")).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


def test_stream_countmin_equals_batch_sketch(spark, events_dir):
    """Whole-fixture replay: the streaming counter table must equal the
    batch CMS counters cell-for-cell, and its min-over-buckets estimate
    must never underestimate any user's exact count (the one-sided-error
    contract of agg_countmin_topk_error, maintained incrementally)."""
    stream = streams.events_file_stream(spark, events_dir)
    name = _mem_name()
    streams.run_to_memory(streams.stream_countmin_counters(stream), name)
    got = {
        (r["j"], r["bucket"]): r["cnt"] for r in spark.table(name).collect()
    }
    want = _batch_cms_counters(spark)
    assert got == want and len(got) > 0
    # one-sided error spot check on the top exact user
    ev = load_tables(spark, SF_SMALL)["events"]
    top = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id").first()
    )
    import hashlib

    from paraslice_spark.operators.aggregates import _CMS_AB, _CMS_P, _CMS_W

    hv = int(hashlib.md5(str(top["user_id"]).encode()).hexdigest()[:8], 16)
    est = min(
        got[(j, ((a * hv + b) % _CMS_P) % _CMS_W)]
        for j, (a, b) in enumerate(_CMS_AB)
    )
    assert est >= top["n"]


def test_stream_countmin_split_replay(spark, tmp_path):
    """Counter state must accumulate across micro-batches: replaying the
    same rows in two chunks lands the identical final counter table as
    one chunk (sketch mergeability, exercised through streaming state)."""
    rows = [
        (1, _ns(0), 7, "click", 1.0, "{}"),
        (2, _ns(1), 7, "click", 1.0, "{}"),
        (3, _ns(2), 8, "click", 1.0, "{}"),
        (4, _ns(3), 9, "view", 1.0, "{}"),
    ]
    one = str(tmp_path / "cms_one")
    _write_batch(spark, one, 0, rows)
    two = str(tmp_path / "cms_two")
    _write_batch(spark, two, 0, rows[:2])
    _write_batch(spark, two, 1, rows[2:])
    final = {}
    for d, trig in ((one, 10), (two, 1)):
        stream = streams.events_file_stream(spark, d, max_files_per_trigger=trig)
        name = _mem_name()
        streams.run_to_memory(streams.stream_countmin_counters(stream), name)
        final[d] = {
            (r["j"], r["bucket"]): r["cnt"]
            for r in spark.table(name).collect()
        }
    assert final[one] == final[two]
    assert sum(final[one].values()) == 4 * len(rows)  # d buckets per event


def test_st4_drop_counter_combines_same_window_rows(spark, tmp_path):
    """numRowsDroppedByWatermark for streaming AGGREGATION counts
    post-partial-aggregation rows: two late rows of the SAME window
    arriving in one micro-batch combine map-side before the state
    operator's late filter, so they count ONCE (two late rows of
    DIFFERENT windows count twice).  Pinned r11 — this is why the
    declared stream_tumbling_watermark_replay oracle models the counter
    as COUNT(DISTINCT (batch, window)), not dropped input rows."""
    import datetime

    d = str(tmp_path / "combine")
    base = int(datetime.datetime(2024, 6, 1).timestamp()) * 1_000_000_000

    def ns(sec):
        return base + int(sec * 1e9)

    # b1 advances the wm to 10900s: hour-0 (end 3600) AND hour-1 (end
    # 7200) are both late for every batch >= 3 (operative wm = stats
    # through batch i-2, the pinned lag)
    _write_batch(spark, d, 0, [(1, ns(10), 1, "c", 1.0, "{}")])
    _write_batch(spark, d, 1, [(2, ns(11500), 1, "c", 1.0, "{}")])
    _write_batch(spark, d, 2, [(3, ns(12000), 1, "c", 1.0, "{}")])  # pad
    _write_batch(
        spark,
        d,
        3,
        [
            # two late rows in hour-0 (same window) + one in hour-1
            (4, ns(20), 1, "c", 1.0, "{}"),
            (5, ns(30), 1, "c", 1.0, "{}"),
            (6, ns(3700), 1, "c", 1.0, "{}"),
        ],
    )
    _write_batch(spark, d, 4, [(9, ns(40000), 1, "c", 1.0, "{}")])

    stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
    agg = streams.watermarked_tumbling(stream, "10 minutes")
    name = _mem_name()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p["stateOperators"] or [])
    )
    # 3 late input rows, but hour-0's pair partial-aggregates into one
    # state-operator row -> counter reads 2, not 3
    assert dropped == 2, dropped


def test_st4_watermark_ms_floor_and_equality_boundary(spark, tmp_path):
    """Two boundary semantics the stream_tumbling_watermark_replay oracle
    encodes, pinned executable (probed r11):

    - EQUALITY EVICTS: an operative watermark exactly EQUAL to a window
      end drops a late row for that window (>=, not >);
    - MS FLOOR: event-time stats are tracked in ms, so a max event time
      0.9 ms past the value that would put the watermark exactly at the
      window end floors DOWN to it — sub-ms precision cannot rescue or
      doom a row.
    """
    import datetime

    base = int(datetime.datetime(2024, 6, 1).timestamp()) * 1_000_000_000

    def ns(sec):
        return base + int(round(sec * 1e9))

    def run(advancer_sec):
        d = str(tmp_path / f"b{advancer_sec}")
        # advancer in b1; pad b2 (operative wm lags two batches); late
        # row for hour-0 (end 3600s) in b3; flush b4
        _write_batch(spark, d, 0, [(1, ns(10), 1, "c", 1.0, "{}")])
        _write_batch(spark, d, 1, [(2, ns(advancer_sec), 1, "c", 1.0, "{}")])
        _write_batch(spark, d, 2, [(8, ns(4100), 1, "c", 1.0, "{}")])
        _write_batch(spark, d, 3, [(3, ns(20), 1, "c", 1.0, "{}")])
        _write_batch(spark, d, 4, [(9, ns(20000), 1, "c", 1.0, "{}")])
        stream = streams.events_file_stream(spark, d, max_files_per_trigger=1)
        agg = streams.watermarked_tumbling(stream, "10 minutes")
        name = _mem_name()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in (p["stateOperators"] or [])
        )
        hour0 = [
            r["n_events"]
            for r in spark.table(name).collect()
            if r["hour_start"] == datetime.datetime(2024, 6, 1, 0, 0)
        ]
        return dropped, hour0

    # wm after advancer = 4200 - 600 = 3600.000 == hour-0 end -> drops
    assert run(4200) == (1, [1])
    # max ts 0.9 ms higher floors to the same ms watermark -> same drop
    assert run(4200.0009) == (1, [1])
    # 1 ms below the boundary: wm 3599.999 < end -> late row still merges
    assert run(4199.999) == (0, [2])
