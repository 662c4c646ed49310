"""Custom Python Data Source tests (PySpark 4 datasource API)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from paraslice_spark.sources.io import load_tables
from paraslice_spark.sources.pydatasource import (
    register_python_sources,
    synthetic_event,
)
from tests.conftest import SF_SMALL


def _enable_pushdown(spark):
    # static-conf in some builds; runtime-settable here (verified) — the
    # sources are test-only, so the driver's session never needs it
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _write_shards(spark, tmp_path, n_shards=3):
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_id", "user_id", "event_type", "value"
    )
    rows = [r.asDict() for r in ev.collect()]
    d = tmp_path / "jsonl"
    d.mkdir()
    for s in range(n_shards):
        with open(d / f"shard{s}.jsonl", "w") as fh:
            for r in rows[s::n_shards]:
                fh.write(json.dumps(r) + "\n")
    return str(d), rows


def test_jsonl_source_reads_all_shards(spark, tmp_path):
    register_python_sources(spark)
    _enable_pushdown(spark)
    path, rows = _write_shards(spark, tmp_path)
    df = spark.read.format("paraslice_jsonl").option("path", path).load()
    assert df.rdd.getNumPartitions() == 3  # one per shard
    got = {tuple(r) for r in df.collect()}
    want = {(r["event_id"], r["user_id"], r["event_type"], r["value"]) for r in rows}
    assert got == want and got


def test_jsonl_source_filter_pushdown_and_residuals(spark, tmp_path):
    """EqualTo(event_type) prunes in-reader; any other predicate must still
    be applied by Spark post-scan (the unsupported-filters contract)."""
    register_python_sources(spark)
    _enable_pushdown(spark)
    path, rows = _write_shards(spark, tmp_path)
    df = (
        spark.read.format("paraslice_jsonl")
        .option("path", path)
        .load()
        .where((F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0))
    )
    got = {tuple(r) for r in df.collect()}
    want = {
        (r["event_id"], r["user_id"], r["event_type"], r["value"])
        for r in rows
        if r["event_type"] == "purchase" and r["user_id"] % 2 == 0
    }
    assert got == want and got


def test_synthetic_stream_source_deterministic_batches(spark):
    register_python_sources(spark)
    stream = (
        spark.readStream.format("paraslice_synthetic_events")
        .option("rows_per_batch", "40")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysrc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("pysrc_stream").collect()}
    assert got == {synthetic_event(i) for i in range(40)}, len(got)


def test_jsonl_writer_round_trip_and_commit_protocol(spark, tmp_path):
    """df.write through the custom writer -> visible shards only after the
    driver commit (no .tmp- files left), and reading back reproduces the
    rows exactly."""
    register_python_sources(spark)
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "out_jsonl")
    ev.repartition(4).write.format("paraslice_jsonl").option("path", out).mode(
        "append"
    ).save()
    import os

    names = sorted(os.listdir(out))
    assert all(n.endswith(".jsonl") and not n.startswith(".tmp-") for n in names)
    assert len(names) == 4  # one committed shard per task
    back = spark.read.format("paraslice_jsonl").option("path", out).load()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ev.collect()}


def test_jsonl_writer_append_twice_keeps_both_batches(spark, tmp_path):
    """ADVICE r6: append-mode commits must not reuse fixed shard{i} names —
    a second save() clobbered the first batch's shards. Two appends must
    leave both batches' shards on disk and read back 2x the rows."""
    register_python_sources(spark)
    _enable_pushdown(spark)
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "out_jsonl_append")
    for _ in range(2):
        ev.repartition(2).write.format("paraslice_jsonl").option(
            "path", out
        ).mode("append").save()
    import os

    assert len(os.listdir(out)) == 4  # 2 batches x 2 shards, no clobber
    back = spark.read.format("paraslice_jsonl").option("path", out).load()
    assert back.count() == 2 * ev.count()
