"""Property tests for the DECLARED real-streaming replay
(stream_session_watermark_replay) — rows-only by design, so correctness
is pinned by properties instead of an oracle: exact determinism across
two full stream executions, drop-counter plausibility against the
straggler design, conservation against the raw event ledger, and
consistency with a watermark-free batch sessionize bound.  The
engine-semantics ground truth (lag-one eviction, post-eviction drop,
merge-rescue) is pinned executable in test_streaming.py::test_st34_*."""

from __future__ import annotations

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _run_fresh(spark):
    from paraslice_spark.streaming import streams

    streams._sswr_cache.clear()
    return [
        tuple(r)
        for r in QUERIES["stream_session_watermark_replay"](
            spark, SF_SMALL
        ).collect()
    ]


def test_replay_is_deterministic_across_executions(spark):
    """Two full stream executions (fresh temp dirs, fresh sink, fresh
    checkpoints) must produce the identical ledger — batch assignment is
    a pure function of (event_id, ts) and file order is pinned by
    mtime."""
    a = _run_fresh(spark)
    b = _run_fresh(spark)
    assert a == b and len(a) > 0


def test_replay_memoized_within_session(spark):
    from paraslice_spark.streaming import streams

    streams._sswr_cache.clear()
    d1 = QUERIES["stream_session_watermark_replay"](spark, SF_SMALL)
    d2 = QUERIES["stream_session_watermark_replay"](spark, SF_SMALL)
    assert d1 is d2  # the stream executed once; actions replay the ckpt


def test_replay_ledger_properties(spark):
    from pyspark.sql import functions as F

    from paraslice_spark.sources.io import load_tables

    rows = _run_fresh(spark)
    ev = load_tables(spark, SF_SMALL)["events"]
    total = ev.count()
    dropped = rows[0][5]
    emitted_events = sum(r[3] for r in rows)
    # the drop counter is live but bounded by the 5% straggler design
    # (only stragglers can arrive post-eviction; boundary cases rescue)
    assert 0 < dropped <= total * 0.06, (dropped, total)
    # conservation: every event is emitted, dropped, or still open in
    # state at end-of-stream (append semantics); the open tail is the
    # last <=14h of a ~30-day stream plus straggler-displaced users
    assert emitted_events + dropped <= total
    assert emitted_events + dropped >= 0.9 * total, (
        emitted_events,
        dropped,
        total,
    )
    # split bound: dropping rows can only SPLIT sessions, so emitted
    # sessions never exceed the watermark-free batch sessionization of
    # the full fixture by more than the drop count
    n_batch = (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("ts"), "12 hours").alias("w"),
        )
        .count()
        .count()
    )
    emitted_sessions = sum(r[1] for r in rows)
    assert emitted_sessions <= n_batch + dropped, (
        emitted_sessions,
        n_batch,
        dropped,
    )
    # schema/shape stability: day rows within the fixture range, constant
    # replay parameters on every row
    assert all(r[4] == 6 and r[5] == dropped for r in rows)
    days = [r[0] for r in rows]
    assert days == sorted(days) and len(set(days)) == len(days)


# ---- stream_tumbling_watermark_replay: engine vs from-scratch Python ----


def tumbling_replay_python(rows, k=6, delay_ms=7_200_000):
    """From-scratch simulator of the declared tumbling replay: pure
    Python/hashlib, sharing no code with either engine.  rows =
    (event_id, ts_ns, value)."""
    import hashlib

    def u32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    def mic(x):
        # half-away-from-zero, the engines' round() (the r9b discipline)
        q = int((abs(x) * 1e6 + 0.5) // 1)
        return -q if x < 0 else q

    recs = []
    for eid, ts_ns, val in rows:
        h = u32(eid)
        arr = ts_ns + (h % 86_400) * 10**9
        recs.append(
            (eid, ts_ns, ts_ns // 1_000_000, mic(val), arr,
             2 if h % 20 == 0 else 0)
        )
    mn = min(r[4] for r in recs)
    mx = max(r[4] for r in recs)
    tagged = [
        (min(k - 1, (arr - mn) * k // (mx - mn + 1) + strag),
         ts_ns, ts_ms, vmic)
        for _, ts_ns, ts_ms, vmic, arr, strag in recs
    ]
    order = sorted({b for b, *_ in tagged})
    idx = {b: i for i, b in enumerate(order)}
    m = {b: max(ts_ms for bb, _, ts_ms, _ in tagged if bb == b) for b in order}
    wm = {}
    for b in order:
        prior = [m[bb] for bb in order if idx[bb] <= idx[b] - 2]
        wm[b] = max(prior) - delay_ms if prior else None
    final_wm = max(r[2] for r in tagged) - delay_ms
    emitted: dict[int, list[int]] = {}
    drop_pairs = set()
    for b, ts_ns, ts_ms, vmic in tagged:
        hr = ts_ns // 3_600_000_000_000
        end_ms = (hr + 1) * 3_600_000
        if wm[b] is not None and wm[b] >= end_ms:
            drop_pairs.add((b, hr))
            continue
        if final_wm >= end_ms:
            e = emitted.setdefault(hr, [0, 0])
            e[0] += 1
            e[1] += vmic
    dropped = len(drop_pairs)
    return [
        (hr, n, v, k, dropped) for hr, (n, v) in sorted(emitted.items())
    ]


def test_tumbling_replay_engine_matches_python(spark):
    """The REAL streaming engine's declared output equals the from-scratch
    simulator on the fixture — engine semantics (lag-2 operative
    watermark, ms floor, >= boundary, finalize emission, partial-agg
    drop combining) re-derived with no shared code."""
    import duckdb

    from paraslice_spark.streaming import streams

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, epoch_ns(ts), value FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    con.close()
    want = tumbling_replay_python(rows)
    streams._stwr_cache.clear()
    got = [
        tuple(r)
        for r in QUERIES["stream_tumbling_watermark_replay"](
            spark, SF_SMALL
        ).collect()
    ]
    assert got == want
    assert got[0][4] > 0  # the drop path is live (non-vacuity)


def test_tumbling_replay_engine_matches_oracle_on_random_tables(spark, tmp_path):
    """ENGINE fuzz — the strongest validation in the repo: random event
    tables replayed through the ACTUAL Structured Streaming engine must
    hash-match the DuckDB oracle (and the Python simulator).  Any error
    in the pinned watermark model (lag, floor, boundary, finalize,
    counter combining) fails here on inputs nobody hand-crafted."""
    import datetime
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from paraslice_spark.registry import ORACLES
    from paraslice_spark.sources import io as pio
    from paraslice_spark.streaming import streams
    from tests.oracle_harness import run_compare

    base_ns = int(datetime.datetime(2024, 3, 1).timestamp()) * 10**9
    for seed in range(3):
        rng = random.Random(31_000 + seed)
        n = rng.randrange(40, 400)
        rows = []
        for eid in range(1, n + 1):
            ts_ns = base_ns + rng.randrange(0, 10 * 86_400) * 10**9 \
                + rng.randrange(0, 10**9)
            rows.append((eid, ts_ns, rng.randrange(0, 10**7) / 1e6))
        d = tmp_path / f"fuzz{seed}"
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] // 1000 for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array(
                        [r[0] % 7 for r in rows], pa.int64()
                    ),
                    "event_type": pa.array(["c"] * n, pa.string()),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * n, pa.string()),
                }
            ),
            str(d / "events.parquet"),
        )
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            os.symlink(f"{SF_SMALL}/{t}.parquet", str(d / f"{t}.parquet"))
        streams._stwr_cache.clear()
        problems = run_compare(
            spark,
            QUERIES["stream_tumbling_watermark_replay"],
            ORACLES["stream_tumbling_watermark_replay"],
            str(d),
        )
        assert not problems, (seed, problems)
        got = [
            tuple(r)
            for r in QUERIES["stream_tumbling_watermark_replay"](
                spark, str(d)
            ).collect()
        ]
        assert got == tumbling_replay_python(rows), seed
        # keep the shared loader cache from pinning the fuzz dir's tables
        pio._cache.pop((pio._session_key(spark), str(d).rstrip("/")), None)


def test_tumbling_replay_engine_matches_oracle_on_degenerate_geometry(
    spark, tmp_path
):
    """Crafted corner geometries random fuzz rarely produces: (a) one
    EVENT TIME shared by every row — the whole batch spread comes from
    the md5 jitter, every row targets the same window, and the finalize
    watermark sits exactly delay behind that single ms; (b) a 3-row
    corpus (most buckets empty → dense batch reindexing, nothing ever
    drops, finalize does all emission).  Engine vs oracle vs simulator
    on each."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from paraslice_spark.registry import ORACLES
    from paraslice_spark.sources import io as pio
    from paraslice_spark.streaming import streams
    from tests.oracle_harness import run_compare

    base_ns = int(datetime.datetime(2024, 3, 1).timestamp()) * 10**9
    same_ts = [(eid, base_ns, 1.0) for eid in (11, 12, 13, 14, 15)]
    tiny = [
        (1, base_ns, 0.25),
        (2, base_ns + 86_400 * 10**9, 0.5),
        (3, base_ns + 2 * 86_400 * 10**9, 0.75),
    ]
    for tag, rows in (("same_ts", same_ts), ("tiny", tiny)):
        n = len(rows)
        d = tmp_path / tag
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] // 1000 for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array([1] * n, pa.int64()),
                    "event_type": pa.array(["c"] * n, pa.string()),
                    "value": pa.array([r[2] for r in rows], pa.float64()),
                    "props": pa.array(["{}"] * n, pa.string()),
                }
            ),
            str(d / "events.parquet"),
        )
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            os.symlink(f"{SF_SMALL}/{t}.parquet", str(d / f"{t}.parquet"))
        streams._stwr_cache.clear()
        problems = run_compare(
            spark,
            QUERIES["stream_tumbling_watermark_replay"],
            ORACLES["stream_tumbling_watermark_replay"],
            str(d),
        )
        assert not problems, (tag, problems)
        got = [
            tuple(r)
            for r in QUERIES["stream_tumbling_watermark_replay"](
                spark, str(d)
            ).collect()
        ]
        assert got == tumbling_replay_python(rows), tag
        pio._cache.pop((pio._session_key(spark), str(d).rstrip("/")), None)


def test_session_replay_properties_on_random_tables(spark, tmp_path):
    """The session replay's property set (determinism across two full
    stream executions, event conservation, session split bound) on
    seeded random event tables — the rows-only twin of the tumbling
    engine fuzz (sessions merge, so no SQL oracle; properties instead)."""
    import datetime
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from paraslice_spark.sources import io as pio
    from paraslice_spark.sources.io import load_tables
    from paraslice_spark.streaming import streams

    base_ns = int(datetime.datetime(2024, 3, 1).timestamp()) * 10**9
    for seed in range(2):
        rng = random.Random(32_000 + seed)
        n = rng.randrange(60, 300)
        rows = []
        for eid in range(1, n + 1):
            ts_ns = base_ns + rng.randrange(0, 20 * 86_400) * 10**9 \
                + rng.randrange(0, 10**9)
            rows.append((eid, ts_ns, rng.randrange(1, 6)))
        d = tmp_path / f"sess{seed}"
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[1] // 1000 for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array(["c"] * n, pa.string()),
                    "value": pa.array([1.0] * n, pa.float64()),
                    "props": pa.array(["{}"] * n, pa.string()),
                }
            ),
            str(d / "events.parquet"),
        )
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            os.symlink(f"{SF_SMALL}/{t}.parquet", str(d / f"{t}.parquet"))

        def run():
            streams._sswr_cache.clear()
            return [
                tuple(r)
                for r in QUERIES["stream_session_watermark_replay"](
                    spark, str(d)
                ).collect()
            ]

        a, b = run(), run()
        assert a == b, seed  # full-stream determinism on random data
        dropped = a[0][5] if a else 0
        emitted_events = sum(r[3] for r in a)
        assert emitted_events + dropped <= n, seed
        n_batch = (
            load_tables(spark, str(d))["events"]
            .groupBy(
                "user_id",
                F.session_window(F.col("ts"), "12 hours").alias("w"),
            )
            .count()
            .count()
        )
        emitted_sessions = sum(r[1] for r in a)
        assert emitted_sessions <= n_batch + dropped, (
            seed, emitted_sessions, n_batch, dropped,
        )
        pio._cache.pop((pio._session_key(spark), str(d).rstrip("/")), None)
