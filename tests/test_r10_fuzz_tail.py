"""Fuzz-tail closure (VERDICT r9 next-round #5), part 1: on
enumeration, five of the six CLAUDE.md-named candidates (funnel
latency, seasonality, LTV cohorts, scorecard, market basket) turned
out ALREADY covered by the late-r9 analytics wave
(tests/test_analytics_oracle_fuzz.py) — the note predated that wave.
The one genuinely uncovered name was events_ab_cuped; its registered
oracle is re-derived here from scratch (exact-integer regr_slope
formula vs DuckDB's streaming covariance) on seeded random tables.
Part 2 (test_r10_fuzz_tail2.py) adds one representative per
composed/statistical family that still lacked any fuzz."""

from __future__ import annotations

import datetime
import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES

def _rnd6(x: float) -> float:
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


@pytest.mark.parametrize("seed", range(6))
def test_ab_cuped_oracle_on_random_tables(seed):
    rng = random.Random(12_000 + seed)
    cut = datetime.datetime(2024, 1, 16)
    rows = []
    for eid in range(1, rng.randrange(60, 400)):
        u = rng.randrange(1, 30)  # both parities guaranteed by density
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            minutes=rng.randrange(0, 60 * 24 * 30)
        )
        v = rng.randrange(0, 900) / 1e6  # micro-exact, small (double-safe)
        rows.append((eid, ts, u, "view", v))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = con.execute(ORACLES["events_ab_cuped"]).fetchall()
    pre: dict[int, int] = {}
    post: dict[int, int] = {}
    for _eid, ts, u, _t, v in rows:
        d = pre if ts < cut else post
        d[u] = d.get(u, 0) + round(v * 1e6)
        (post if d is pre else pre).setdefault(u, 0)
    users = sorted(pre)
    x = [pre[u] for u in users]
    y = [post[u] for u in users]
    n = len(users)
    sx, sy = sum(x), sum(y)
    sxx = sum(a * a for a in x)
    sxy = sum(a * b for a, b in zip(x, y))
    theta = _rnd6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    n0 = sum(1 for u in users if u % 2 == 0)
    n1 = n - n0
    sp0 = sum(pre[u] for u in users if u % 2 == 0)
    sp1 = sum(pre[u] for u in users if u % 2 == 1)
    so0 = sum(post[u] for u in users if u % 2 == 0)
    so1 = sum(post[u] for u in users if u % 2 == 1)
    raw = so1 / n1 - so0 / n0
    cuped = raw - theta * (sp1 / n1 - sp0 / n0)
    want = (n0, n1, theta, _rnd6(raw / 1e6), _rnd6(cuped / 1e6))
    assert got == [want], seed
