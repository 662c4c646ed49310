"""Structured Streaming layer (SURVEY §2.10 ST4-ST8).

File-source streams over the events schema + the stateful operators that
only exist on streams (watermark drop, within-watermark dedup, custom
state). Tests replay fixture data through these; the batch twins in
batch_twins.py carry the oracle checks.

At scale these run identically: file/Kafka source -> watermarked event-time
aggs with state-store-backed incremental execution; output to partitioned
sinks. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: parquet-on-disk schema of events under nanosAsLong (ts is raw ns epoch)
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def events_file_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over a directory of events-schema parquet files.

    One file per micro-batch (deterministic replay order for late-data
    tests). Applies the same ns->us ts repair as the batch loader.
    """
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )
    return raw.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """writeStream to an in-memory table (ST8) and process everything
    currently available. Caller reads ``spark.table(name)``."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def watermarked_tumbling(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST4: watermarked per-hour counts — append mode emits a window only
    once the watermark passes its end; later-than-watermark rows drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("hour_start"), "n_events")
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST5: exactly-once by event_id with bounded state (state for ids older
    than the watermark is evicted — the 100 TB-safe dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """ST7: stream ⋈ static dim — the dim is re-read per micro-batch; at
    scale broadcast it (tiny) so the stream never shuffles."""
    dim = F.broadcast(customer.select("c_custkey", "c_nationkey"))
    return events.join(dim, events.user_id == dim.c_custkey, "inner").select(
        "event_id", "user_id", "event_type", "c_nationkey"
    )


def running_count_per_user(events: DataFrame) -> DataFrame:
    """ST6: custom stateful op — running per-user event counter via
    applyInPandasWithState (GroupState with processing-time timeout).

    Each micro-batch updates O(#users) state; emits (user_id, total so far).
    """
    import pandas as pd  # local import: only needed when the op runs
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
