"""Fixture-independent fuzz of the rank-statistic ORACLES: on seeded
random tables (heavy ties, skewed group sizes, tiny n) the registered
SQL must match a from-scratch naive Python computation.  Pure DuckDB —
complements test_rank_stats.py (which pins the Spark side to the oracle
on the real fixture) by making the formulas robust to fixture
regeneration."""

from __future__ import annotations

import collections
import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


def _mw_naive(vals):
    pooled = sorted(v for v, _ in vals)
    ranks, i = {}, 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    n1 = sum(1 for _, g in vals if g == "R")
    n2 = len(vals) - n1
    r1 = sum(ranks[v] for v, g in vals if g == "R")
    two_u1 = round(2 * r1) - n1 * (n1 + 1)
    tie = collections.Counter(v for v, _ in vals)
    tie_term = sum(t**3 - t for t in tie.values())
    return n1, n2, two_u1, tie_term


@pytest.mark.parametrize("seed", range(10))
def test_mannwhitney_oracle_on_random_tables(seed):
    rng = random.Random(seed)
    n = rng.randrange(20, 400)
    vmax = rng.choice([3, 10, 200])  # vmax=3 → massive ties
    vals = [
        (rng.randrange(1, vmax + 1), rng.choice("RN"))
        for _ in range(n)
    ]
    # the declared contract assumes both groups present (fixture always has
    # R and N); force it
    vals[0] = (vals[0][0], "R")
    vals[1] = (vals[1][0], "N")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_quantity DOUBLE, l_returnflag VARCHAR)"
    )
    con.executemany(
        "INSERT INTO lineitem VALUES (?, ?)", [(float(v), g) for v, g in vals]
    )
    row = con.execute(ORACLES["lineitem_mannwhitney_u"]).fetchone()
    n1, n2, two_u1, tie_term = _mw_naive(vals)
    assert row[:4] == (n1, n2, two_u1, tie_term), (seed, row)
    nn = n1 + n2
    var = n1 * n2 / 12.0 * ((nn + 1) - tie_term / (nn * (nn - 1.0)))
    if var > 0:
        z = (two_u1 / 2.0 - n1 * n2 / 2.0) / math.sqrt(var)
        assert abs(row[5] - z) < 2e-6, (seed, row)


@pytest.mark.parametrize("seed", range(10))
def test_ks_oracle_on_random_tables(seed):
    import bisect

    rng = random.Random(100 + seed)
    n = rng.randrange(20, 500)
    vmax = rng.choice([5, 50, 10**6])
    rows = [
        (
            rng.randrange(1, vmax + 1) / 100.0,
            rng.choice(["1-URGENT", "5-LOW"]),
        )
        for _ in range(n)
    ]
    rows[0] = (rows[0][0], "1-URGENT")
    rows[1] = (rows[1][0], "5-LOW")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_totalprice DOUBLE, o_orderpriority VARCHAR)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?)", rows)
    got = con.execute(ORACLES["orders_ks_price_shift"]).fetchone()
    a = sorted(round(v * 100) for v, g in rows if g == "1-URGENT")
    b = sorted(round(v * 100) for v, g in rows if g == "5-LOW")
    n1, n2 = len(a), len(b)
    best, best_v = -1, None
    for v in sorted({*a, *b}):
        d = abs(bisect.bisect_right(a, v) * n2 - bisect.bisect_right(b, v) * n1)
        if d > best:
            best, best_v = d, v
    assert (got[0], got[1], got[2], got[4]) == (n1, n2, best, best_v), (
        seed,
        got,
    )


@pytest.mark.parametrize("seed", range(8))
def test_spearman_oracle_on_random_tables(seed):
    rng = random.Random(200 + seed)
    n = rng.randrange(10, 300)
    vmax = rng.choice([4, 30])
    rows = [
        (float(rng.randrange(1, vmax + 1)),
         rng.randrange(1, vmax * 7 + 1) / 100.0)
        for _ in range(n)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_quantity DOUBLE, l_extendedprice DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
    got = con.execute(ORACLES["lineitem_spearman_qty_price"]).fetchone()

    def rank2(vals):
        pooled = sorted(vals)
        r, i = {}, 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j] == pooled[i]:
                j += 1
            r[pooled[i]] = (i + 1) + j
            i = j
        return [r[v] for v in vals]

    xs = [round(q) for q, _ in rows]
    ys = [round(p * 100) for _, p in rows]
    a, b = rank2(xs), rank2(ys)
    sx, sy = sum(a), sum(b)
    sxx = sum(v * v for v in a)
    syy = sum(v * v for v in b)
    sxy = sum(u * v for u, v in zip(a, b))
    assert got[:6] == (n, sx, sy, sxx, syy, sxy), (seed, got)
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den > 0:
        rho = (n * sxy - sx * sy) / math.sqrt(den)
        assert abs(got[6] - rho) < 2e-6, (seed, got)


@pytest.mark.parametrize("seed", range(6))
def test_backlog_oracle_on_random_intervals(seed):
    rng = random.Random(300 + seed)
    import datetime

    n_orders = rng.randrange(5, 60)
    base = datetime.datetime(1995, 1, 1)
    orders, lines = [], []
    for ok in range(n_orders):
        od = base + datetime.timedelta(days=rng.randrange(0, 200))
        orders.append((ok, od))
        for _ in range(rng.randrange(0, 4)):  # some orders have NO lines
            lines.append(
                (ok, od + datetime.timedelta(days=rng.randrange(0, 90)))
            )
    con = duckdb.connect()
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_orderdate TIMESTAMP)")
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT, l_shipdate TIMESTAMP)")
    con.executemany("INSERT INTO orders VALUES (?, ?)", orders)
    if not lines:
        lines = [(orders[0][0], orders[0][1])]
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", lines)
    got = {
        r[0]: (r[1], r[2], r[4])
        for r in con.execute(ORACLES["orders_backlog_profile"]).fetchall()
    }
    # naive daily sweep
    last_ship = {}
    for ok, sd in lines:
        last_ship[ok] = max(last_ship.get(ok, sd), sd)
    ivs = [
        ((od - base).days, (last_ship[ok] - base).days + 1)
        for ok, od in orders
        if ok in last_ship
    ]
    off = (base - datetime.datetime(1970, 1, 1)).days
    lo = min(s for s, _ in ivs)
    hi = max(e for _, e in ivs)
    monthly = collections.defaultdict(list)
    for d in range(lo, hi + 1):
        bl = sum(1 for s, e in ivs if s <= d < e)
        dt = base + datetime.timedelta(days=d - 0)
        dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(days=d + off)
        monthly[dt.year * 12 + dt.month].append((d + off, bl))
    exp = {
        ym: (len(v), max(b for _, b in v), max(v)[1])
        for ym, v in monthly.items()
    }
    assert got == exp, (seed, got, exp)


@pytest.mark.parametrize("seed", range(6))
def test_autocorr_oracle_on_random_series(seed):
    rng = random.Random(400 + seed)
    import datetime

    n_ev = rng.randrange(10, 300)
    base = datetime.datetime(2024, 1, 1)
    evs = [
        base + datetime.timedelta(minutes=rng.randrange(0, 500),
                                  seconds=rng.randrange(0, 60))
        for _ in range(n_ev)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE events(ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?)", [(t,) for t in evs])
    got = {r[0]: (r[1], r[2], r[3]) for r in
           con.execute(ORACLES["events_autocorr_minutes"]).fetchall()}
    mins = collections.Counter(
        int((t - datetime.datetime(1970, 1, 1)).total_seconds() // 60)
        for t in evs
    )
    lo, hi = min(mins), max(mins)
    x = [mins.get(m, 0) for m in range(lo, hi + 1)]
    n, s = len(x), sum(x)
    den = sum((n * v - s) ** 2 for v in x)
    for k in range(1, 6):
        num = sum(
            (n * x[t] - s) * (n * x[t + k] - s) for t in range(len(x) - k)
        )
        if k in got:
            assert got[k] == (n, num, den), (seed, k, got.get(k))
