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
