"""Fuzz-tail closure (VERDICT r9 next-round #5): fixture-independent
random-table rederivations for the last six composed/statistical oracle
families that until now were validated only on the fixture —
CUPED, funnel latency, seasonality profile, LTV cohorts, the supplier
scorecard, and market-basket lift.  Same discipline as the other
*_oracle_fuzz files: the registered DuckDB oracle runs on a seeded
random table and must match a from-scratch pure-Python derivation
(half-away _rnd6 for every engine-ROUNDed ratio; integer money inputs
so cents/micros quantization is representation-exact)."""

from __future__ import annotations

import datetime
import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES

_EPOCH = datetime.datetime(1970, 1, 1)


def _ns(t: datetime.datetime) -> int:
    return int((t - _EPOCH) // datetime.timedelta(microseconds=1)) * 1000


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


@pytest.mark.parametrize("seed", range(6))
def test_funnel_latency_oracle_on_random_tables(seed):
    rng = random.Random(12_100 + seed)
    rows = []
    base = datetime.datetime(2024, 4, 1)
    for eid in range(1, rng.randrange(80, 400)):
        u = rng.randrange(1, 25)
        # coarse second grid forces same-ts stage collisions (strict >)
        ts = base + datetime.timedelta(seconds=rng.randrange(0, 500) * 60)
        rows.append((eid, ts, u, rng.choice(["view", "click", "purchase"])))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    got = con.execute(ORACLES["events_funnel_latency"]).fetchall()
    by_user: dict[int, list] = {}
    for _eid, ts, u, ty in rows:
        by_user.setdefault(u, []).append((_ns(ts), ty))
    lats: dict[str, list[int]] = {"view_to_click": [], "click_to_purchase": []}
    for evs in by_user.values():
        tv = min((t for t, ty in evs if ty == "view"), default=None)
        if tv is None:
            continue
        tc = min((t for t, ty in evs if ty == "click" and t > tv), default=None)
        if tc is None:
            continue
        lats["view_to_click"].append((tc - tv) // 1_000_000_000)
        tp = min(
            (t for t, ty in evs if ty == "purchase" and t > tc), default=None
        )
        if tp is not None:
            lats["click_to_purchase"].append((tp - tc) // 1_000_000_000)
    want = []
    for step in sorted(lats):
        ls = sorted(lats[step])
        if not ls:
            continue
        n = len(ls)
        want.append(
            (
                step,
                n,
                ls[(n + 1) // 2 - 1],
                ls[(9 * n + 9) // 10 - 1],
                _rnd6(sum(ls) / n),
            )
        )
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_seasonality_profile_oracle_on_random_tables(seed):
    rng = random.Random(12_200 + seed)
    rows = []
    for eid in range(1, rng.randrange(50, 400)):
        ts = datetime.datetime(2024, 5, 1) + datetime.timedelta(
            minutes=rng.randrange(0, 60 * 24 * 21)
        )
        rows.append((eid, ts))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(ORACLES["events_seasonality_profile"]).fetchall()
    counts: dict[tuple[int, int], int] = {}
    for _eid, ts in rows:
        dow = (ts.weekday() + 1) % 7 + 1  # Spark rule: Sunday=1
        counts[(dow, ts.hour)] = counts.get((dow, ts.hour), 0) + 1
    total = sum(counts.values())
    want = [
        (dow, hod, c, _rnd6(c / total))
        for (dow, hod), c in sorted(counts.items())
    ]
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_ltv_cohorts_oracle_on_random_tables(seed):
    rng = random.Random(12_300 + seed)
    rows = []
    for ok in range(1, rng.randrange(50, 300)):
        d = datetime.date(2023, 1, 1) + datetime.timedelta(
            days=rng.randrange(0, 700)
        )
        rows.append((ok, rng.randrange(1, 25), d, rng.randrange(100, 2_000_000) / 100.0))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderdate DATE, o_totalprice DOUBLE)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?, ?)", rows)
    got = con.execute(ORACLES["customer_ltv_cohorts"]).fetchall()
    cm: dict[tuple[int, int], int] = {}
    for _ok, ck, d, p in rows:
        mi = d.year * 12 + d.month
        cm[(ck, mi)] = cm.get((ck, mi), 0) + round(p * 100)
    m0 = {}
    for ck, mi in cm:
        m0[ck] = min(m0.get(ck, mi), mi)
    g: dict[tuple[int, int], list[int]] = {}
    for (ck, mi), rev in cm.items():
        key = (m0[ck], mi - m0[ck])
        e = g.setdefault(key, [0, 0])
        e[0] += 1
        e[1] += rev
    want = []
    for (mm0, k) in sorted(g):
        n_active, rev = g[(mm0, k)]
        cohort = g[(mm0, 0)][0]
        cum = sum(g[(mm0, kk)][1] for kk in range(k + 1) if (mm0, kk) in g)
        want.append(
            (
                (mm0 - 1) // 12,
                (mm0 - 1) % 12 + 1,
                k,
                n_active,
                rev / 100.0,
                _rnd6(n_active / cohort),
                _rnd6(cum / (cohort * 100.0)),
            )
        )
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_supplier_scorecard_oracle_on_random_tables(seed):
    rng = random.Random(12_400 + seed)
    n_sup, n_nat = rng.randrange(3, 12), 4
    sup = [(s, f"S{s}", rng.randrange(0, n_nat)) for s in range(1, n_sup + 1)]
    nat = [(k, f"N{k}") for k in range(n_nat)]
    li = [
        (
            rng.randrange(1, n_sup + 1),
            rng.randrange(1, 40),
            rng.randrange(100, 900_000) / 100.0,
            rng.choice([0, 1, 2, 5, 8, 10]) / 100.0,
            rng.choice(["R", "A", "N"]),
        )
        for _ in range(rng.randrange(60, 400))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_suppkey BIGINT, l_partkey BIGINT,"
        " l_extendedprice DOUBLE, l_discount DOUBLE, l_returnflag VARCHAR)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?, ?)", li)
    con.execute("CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR,"
                " s_nationkey BIGINT)")
    con.executemany("INSERT INTO supplier VALUES (?, ?, ?)", sup)
    con.execute("CREATE TABLE nation(n_nationkey BIGINT, n_name VARCHAR)")
    con.executemany("INSERT INTO nation VALUES (?, ?)", nat)
    got = con.execute(ORACLES["supplier_scorecard"]).fetchall()
    agg: dict[int, list] = {}
    for sk, pk, ep, dc, rf in li:
        e = agg.setdefault(sk, [0, set(), 0, 0])
        e[0] += 1
        e[1].add(pk)
        e[2] += round(ep * 100) * (100 - round(dc * 100))
        e[3] += rf == "R"
    want = [
        (
            sk,
            f"S{sk}",
            f"N{dict((s, nk) for s, _n, nk in sup)[sk]}",
            agg[sk][0],
            len(agg[sk][1]),
            agg[sk][2] / 10_000.0,
            _rnd6(agg[sk][3] / agg[sk][0]),
        )
        for sk in sorted(agg)
    ]
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_market_basket_oracle_on_random_tables(seed):
    rng = random.Random(12_500 + seed)
    li = []
    for ok in range(1, rng.randrange(30, 150)):
        basket = rng.sample(range(1, 15), rng.randrange(1, 6))
        for pk in basket:
            for _ in range(rng.randrange(1, 3)):  # dup lines test DISTINCT
                li.append((ok, pk))
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", li)
    got = con.execute(ORACLES["market_basket_pairs"]).fetchall()
    baskets: dict[int, set] = {}
    for ok, pk in li:
        baskets.setdefault(ok, set()).add(pk)
    supp: dict[tuple[int, int], int] = {}
    cnt: dict[int, int] = {}
    for b in baskets.values():
        for pk in b:
            cnt[pk] = cnt.get(pk, 0) + 1
        bs = sorted(b)
        for i, a in enumerate(bs):
            for c in bs[i + 1:]:
                supp[(a, c)] = supp.get((a, c), 0) + 1
    n_orders = len(baskets)
    ranked = sorted(supp.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [
        (a, c, s, _rnd6(n_orders * s / (cnt[a] * cnt[c])))
        for (a, c), s in ranked
    ]
    assert got == want, seed
