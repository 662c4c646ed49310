"""Fixture-independent fuzz of the EXPERIMENTATION / MONITORING oracles
on seeded random event tables (the bi/rankstat fuzz discipline): the
two-proportion z-test, the chi-square independence test, the
seasonal-naive forecast backtest, and the hourly z-score monitor are
each recomputed from scratch in Python.  The float statistics are
checked to the oracle's own rounding (or a 1e-4 tolerance where the
engines' stddev accumulation order is the only difference)."""

from __future__ import annotations

import datetime
import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES

_EPOCH = datetime.datetime(1970, 1, 1)
_TYPES = ("click", "error", "purchase", "signup", "view")


def _rnd6(x: float) -> float:
    """Half-AWAY-from-zero at 6 places — both engines' ROUND on doubles.
    Python's round() is banker's and differs on exactly-dyadic ratios
    (e.g. 85/128 = 0.6640625 → engines 0.664063, banker's 0.664062)."""
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


def _event_table(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    return con


def _rand_log(rng, n_users, n_rows, hour_span):
    base = datetime.datetime(2024, 10, 1)
    rows = [
        (
            eid,
            base + datetime.timedelta(
                hours=rng.randrange(0, hour_span),
                seconds=rng.randrange(0, 3600),
            ),
            rng.randrange(1, n_users + 1),
            rng.choice(_TYPES),
            1.0,
        )
        for eid in range(1, n_rows + 1)
    ]
    # guarantee every (type, parity) cell is populated (chi², A/B sanity)
    eid = n_rows + 1
    for t in _TYPES:
        for par in (0, 1):
            rows.append((eid, base, par + 1, t, 1.0))
            eid += 1
    return rows


@pytest.mark.parametrize("seed", range(6))
def test_ab_test_oracle_on_random_tables(seed):
    rng = random.Random(25_000 + seed)
    rows = _rand_log(rng, rng.randrange(4, 20), rng.randrange(80, 600), 24)
    # guarantee a converter (>= 10 purchases) in each variant, and a
    # non-converter population, so pooled p is in (0, 1)
    eid = max(r[0] for r in rows) + 1
    base = datetime.datetime(2024, 10, 2)
    for u in (1, 2):
        for k in range(12):
            rows.append((eid, base, u, "purchase", 1.0))
            eid += 1
    got = _event_table(rows).execute(ORACLES["events_ab_test"]).fetchall()[0]
    per_user: dict[int, int] = {}
    users = set()
    for _, _, u, ty, _ in rows:
        users.add(u)
        if ty == "purchase":
            per_user[u] = per_user.get(u, 0) + 1
    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for u in users:
        n[u % 2] += 1
        c[u % 2] += per_user.get(u, 0) >= 10
    p0, p1 = c[0] * 1.0 / n[0], c[1] * 1.0 / n[1]
    pooled = (c[0] + c[1]) * 1.0 / (n[0] + n[1])
    z = (p1 - p0) / math.sqrt(
        pooled * (1.0 - pooled) * ((1.0 / n[0]) + (1.0 / n[1]))
    )
    assert got[:4] == (n[0], c[0], n[1], c[1]), seed
    assert got[4] == _rnd6(p0) and got[5] == _rnd6(p1), seed
    assert abs(got[6] - z) < 1e-6, seed


@pytest.mark.parametrize("seed", range(6))
def test_chi2_oracle_on_random_tables(seed):
    rng = random.Random(26_000 + seed)
    rows = _rand_log(rng, rng.randrange(4, 16), rng.randrange(60, 500), 24)
    got = _event_table(rows).execute(
        ORACLES["events_chi2_independence"]
    ).fetchall()[0]
    o = {(t, v): 0 for t in _TYPES for v in (0, 1)}
    for _, _, u, ty, _ in rows:
        o[(ty, u % 2)] += 1
    rt = {t: o[(t, 0)] + o[(t, 1)] for t in _TYPES}
    ct = {v: sum(o[(t, v)] for t in _TYPES) for v in (0, 1)}
    n = sum(rt.values())
    chi2 = 0.0
    for t in _TYPES:
        for v in (0, 1):
            e = rt[t] * ct[v] / n
            chi2 += (o[(t, v)] - e) ** 2 / e
    assert got[0] == n and got[2] == len(_TYPES) - 1, seed
    assert abs(got[1] - chi2) < 1e-6, seed


@pytest.mark.parametrize("seed", range(6))
def test_forecast_backtest_oracle_on_random_tables(seed):
    rng = random.Random(27_000 + seed)
    # > 24 observed hours per type so the lag-24 baseline has support
    rows = _rand_log(rng, 8, rng.randrange(800, 2_000), 60)
    con = _event_table(rows)
    got = {
        r[0]: r[1:]
        for r in con.execute(
            ORACLES["events_forecast_backtest_by_type"]
        ).fetchall()
    }
    got_global = con.execute(ORACLES["events_forecast_backtest"]).fetchall()[0]
    hourly: dict[str, dict[int, int]] = {}
    for _, ts, _, ty, _ in rows:
        h = int((ts - _EPOCH).total_seconds()) // 3600
        d = hourly.setdefault(ty, {})
        d[h] = d.get(h, 0) + 1
    expect = {}
    for ty, hs in hourly.items():
        ns = [hs[h] for h in sorted(hs)]
        pairs = [(ns[i], ns[i - 24]) for i in range(24, len(ns))]
        if not pairs:
            continue
        sae = sum(abs(a - b) for a, b in pairs)
        sy = sum(a for a, _ in pairs)
        expect[ty] = (
            len(pairs),
            sae,
            sae / len(pairs),
            _rnd6(sae / sy),
        )
    assert set(got) == set(expect), seed
    for ty, (nh, sae, mae, wape) in expect.items():
        assert got[ty][0] == nh and got[ty][1] == sae, (seed, ty)
        assert abs(got[ty][2] - mae) < 1e-9 and got[ty][3] == wape, (seed, ty)
    # the GLOBAL variant: same formula over the type-blind hourly series
    allh: dict[int, int] = {}
    for _, ts, _, _, _ in rows:
        h = int((ts - _EPOCH).total_seconds()) // 3600
        allh[h] = allh.get(h, 0) + 1
    ns = [allh[h] for h in sorted(allh)]
    pairs = [(ns[i], ns[i - 24]) for i in range(24, len(ns))]
    sae = sum(abs(a - b) for a, b in pairs)
    sy = sum(a for a, _ in pairs)
    assert got_global[0] == len(pairs) and got_global[1] == sae, seed
    assert abs(got_global[2] - sae / len(pairs)) < 1e-9, seed
    assert got_global[3] == _rnd6(sae / sy), seed


@pytest.mark.parametrize("seed", range(6))
def test_anomaly_zscore_oracle_on_random_tables(seed):
    rng = random.Random(28_000 + seed)
    rows = _rand_log(rng, 6, rng.randrange(200, 900), 30)
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _event_table(rows)
        .execute(ORACLES["events_anomaly_zscore"])
        .fetchall()
    }
    hourly: dict[str, dict[int, int]] = {}
    for _, ts, _, ty, _ in rows:
        h = int((ts - _EPOCH).total_seconds()) // 3600
        d = hourly.setdefault(ty, {})
        d[h] = d.get(h, 0) + 1
    for ty, hs in hourly.items():
        ns = list(hs.values())
        mean = sum(ns) / len(ns)
        var = sum((x - mean) ** 2 for x in ns) / (len(ns) - 1)
        sd = math.sqrt(var)
        for h, cnt in hs.items():
            n_got, z_got = got[(ty, h)]
            assert n_got == cnt, (seed, ty, h)
            assert abs(z_got - (cnt - mean) / sd) < 1e-4, (seed, ty, h)
    assert set(got) == {
        (ty, h) for ty, hs in hourly.items() for h in hs
    }, seed
