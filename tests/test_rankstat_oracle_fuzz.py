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
