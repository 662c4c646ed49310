"""Fixture-independent fuzz of the TIME-SERIES / CADENCE analytics
oracles on seeded random tables: CUSUM change-point (exact n-scaled
argmax with earliest-minute ties), hourly OHLC bars (positional
open/close under deliberate same-timestamp ties), exact heavy hitters
(tie-broken top-20), and the reorder-gap profile (nearest-rank
percentiles over the per-segment gap histogram).  Engine ROUND is
half-away-from-zero — the `_rnd6` helper, not Python's banker's
round() (the test_ab_oracle_fuzz lesson)."""

from __future__ import annotations

import datetime
import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES

_EPOCH = datetime.datetime(1970, 1, 1)


def _rnd6(x: float) -> float:
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


def _ns(t: datetime.datetime) -> int:
    return int((t - _EPOCH) // datetime.timedelta(microseconds=1)) * 1000


def _event_table(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    return con


@pytest.mark.parametrize("seed", range(6))
def test_cusum_oracle_on_random_tables(seed):
    rng = random.Random(29_000 + seed)
    base = datetime.datetime(2024, 11, 1)
    rows = []
    for eid in range(1, rng.randrange(40, 300)):
        m = rng.randrange(0, 50)
        rows.append(
            (
                eid,
                base + datetime.timedelta(
                    minutes=m, seconds=rng.randrange(0, 60)
                ),
                1,
                rng.choice(["a", "b"]),
                # level shift halfway through → a real change point
                (rng.randrange(0, 300) + (1000 if m >= 25 else 0)) / 100.0,
            )
        )
    got = {
        r[0]: r[1:]
        for r in _event_table(rows)
        .execute(ORACLES["events_cusum_changepoint"])
        .fetchall()
    }
    series: dict[str, dict[int, int]] = {}
    for _, ts, _, ty, v in rows:
        m = _ns(ts) // 60_000_000_000
        d = series.setdefault(ty, {})
        d[m] = d.get(m, 0) + round(v * 1_000_000)
    for ty, s in series.items():
        mins = sorted(s)
        n, tot = len(mins), sum(s.values())
        pre, best = 0, (-1, None)
        for i, m in enumerate(mins, start=1):
            pre += s[m]
            a = abs(n * pre - i * tot)
            if a > best[0]:
                best = (a, m)
        gn, gcp, gmax, gmean = got[ty]
        assert gn == n and gcp == best[1], (seed, ty)
        assert gmax == _rnd6(best[0] / (n * 1e6)), (seed, ty)
        assert gmean == _rnd6(tot / (n * 1e6)), (seed, ty)


@pytest.mark.parametrize("seed", range(6))
def test_ohlc_oracle_on_random_tables(seed):
    rng = random.Random(30_000 + seed)
    base = datetime.datetime(2024, 12, 1)
    rows = []
    for eid in range(1, rng.randrange(30, 250)):
        rows.append(
            (
                eid,
                # second-grid inside a few hours → same-ts ties, and the
                # open/close pick must follow event_id within a tie
                base + datetime.timedelta(
                    hours=rng.randrange(0, 5), seconds=rng.randrange(0, 20)
                ),
                1,
                "a",
                rng.randrange(0, 2_000_000) / 1e6,
            )
        )
    got = {
        r[0]: r[1:]
        for r in _event_table(rows)
        .execute(ORACLES["events_ohlc_hourly"])
        .fetchall()
    }
    bars: dict[int, list] = {}
    for eid, ts, _, _, v in rows:
        h = _ns(ts) // 3_600_000_000_000
        bars.setdefault(h, []).append((_ns(ts), eid, round(v * 1_000_000)))
    expect = {}
    for h, evs in bars.items():
        evs.sort()
        mvs = [mv for _, _, mv in evs]
        expect[h] = (
            len(evs),
            evs[0][2],
            max(mvs),
            min(mvs),
            evs[-1][2],
            sum(mvs),
        )
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_heavy_hitters_oracle_on_random_tables(seed):
    rng = random.Random(31_000 + seed)
    base = datetime.datetime(2025, 1, 1)
    # zipf-ish: low user ids much hotter; >20 distinct users so the
    # LIMIT 20 boundary (tie-broken by user_id) is actually exercised
    rows = [
        (
            eid,
            base + datetime.timedelta(seconds=eid),
            min(rng.randrange(1, 40), rng.randrange(1, 40)),
            "a",
            1.0,
        )
        for eid in range(1, rng.randrange(150, 600))
    ]
    got = [
        tuple(r)
        for r in _event_table(rows)
        .execute(ORACLES["events_heavy_hitters"])
        .fetchall()
    ]
    counts: dict[int, int] = {}
    for _, _, u, _, _ in rows:
        counts[u] = counts.get(u, 0) + 1
    total = sum(counts.values())
    expect = [
        (u, n, _rnd6(n / total))
        for u, n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:20]
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_reorder_gaps_oracle_on_random_tables(seed):
    rng = random.Random(32_000 + seed)
    n_cust = rng.randrange(4, 25)
    segs = ["SA", "SB"]
    cust = [(ck, rng.choice(segs)) for ck in range(1, n_cust + 1)]
    orders = [
        (
            ok,
            rng.randrange(1, n_cust + 1),
            datetime.datetime(1996, 1, 1)
            # same-day repeats → deterministic 0-gaps
            + datetime.timedelta(days=rng.randrange(0, 30)),
        )
        for ok in range(1, rng.randrange(40, 250))
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_mktsegment VARCHAR)")
    con.executemany("INSERT INTO customer VALUES (?, ?)", cust)
    con.execute(
        "CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", orders)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["customer_reorder_gaps"]).fetchall()
    }
    seg_of = dict(cust)
    by_cust: dict[int, list] = {}
    for _, ck, dt in orders:
        by_cust.setdefault(ck, []).append(
            (dt - datetime.datetime(1970, 1, 1)).days
        )
    gaps: dict[str, list] = {}
    for ck, ds in by_cust.items():
        ds.sort()
        for a, b in zip(ds, ds[1:]):
            gaps.setdefault(seg_of[ck], []).append(b - a)
    expect = {}
    for seg, gs in gaps.items():
        gs.sort()
        n = len(gs)
        expect[seg] = (
            n,
            gs[(n + 1) // 2 - 1],
            gs[(9 * n + 9) // 10 - 1],
            gs[-1],
            _rnd6(sum(gs) / n),
        )
    assert got == expect, seed


def _ntile4(keys):
    """1-based ntile(4) assignment for an already-ordered key list —
    first (n mod 4) tiles take the extra row (both engines' rule)."""
    n = len(keys)
    out = {}
    start = 0
    for t in range(4):
        size = n // 4 + (1 if t < n % 4 else 0)
        for k in keys[start:start + size]:
            out[k] = t + 1
        start += size
    return out


@pytest.mark.parametrize("seed", range(6))
def test_rfm_oracle_on_random_tables(seed):
    rng = random.Random(33_000 + seed)
    n_cust = rng.randrange(5, 40)
    orders = [
        (
            rng.randrange(1, n_cust + 1),
            rng.randrange(100, 40_000) / 100.0,
            datetime.datetime(1997, 1, 1)
            + datetime.timedelta(days=rng.randrange(0, 20)),
        )
        for _ in range(rng.randrange(n_cust, n_cust * 5))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_custkey BIGINT, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", orders)
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(ORACLES["customer_rfm_segments"]).fetchall()
    }
    base: dict[int, list] = {}
    for ck, tp, dt in orders:
        a = base.setdefault(ck, [datetime.datetime.min, 0, 0])
        a[0] = max(a[0], dt)
        a[1] += 1
        a[2] += round(tp * 100)
    customers = sorted(base)
    r_of = _ntile4(sorted(customers, key=lambda c: (base[c][0], c)))
    f_of = _ntile4(sorted(customers, key=lambda c: (base[c][1], c)))
    m_of = _ntile4(sorted(customers, key=lambda c: (base[c][2], c)))
    expect: dict[tuple, int] = {}
    for c in customers:
        k = (r_of[c], f_of[c], m_of[c])
        expect[k] = expect.get(k, 0) + 1
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_abc_oracle_on_random_tables(seed):
    rng = random.Random(34_000 + seed)
    li = [
        (
            rng.randrange(1, 30),
            rng.randrange(1_000, 900_000) / 100.0,
            rng.choice([0, 2, 5, 10]) / 100.0,
        )
        for _ in range(rng.randrange(40, 400))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_partkey BIGINT, l_extendedprice DOUBLE,"
        " l_discount DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?)", li)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["part_abc_analysis"]).fetchall()
    }
    rev: dict[int, int] = {}
    for pk, ep, dc in li:
        rev[pk] = rev.get(pk, 0) + round(ep * 100) * (100 - round(dc * 100))
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    expect: dict[str, list] = {}
    cum = 0
    for pk, rc in ranked:
        cum += rc
        cls = "A" if cum * 100 <= total * 80 else (
            "B" if cum * 100 <= total * 95 else "C"
        )
        e = expect.setdefault(cls, [0, 0])
        e[0] += 1
        e[1] += rc
    assert got == {
        c: (n, rc / 10_000.0) for c, (n, rc) in expect.items()
    }, seed


@pytest.mark.parametrize("seed", range(6))
def test_active_users_oracle_on_random_tables(seed):
    rng = random.Random(35_000 + seed)
    base = datetime.datetime(2025, 2, 1)
    rows = [
        (
            eid,
            base + datetime.timedelta(
                days=rng.randrange(0, 15), seconds=rng.randrange(0, 86_400)
            ),
            rng.randrange(1, 9),
            "a",
            1.0,
        )
        for eid in range(1, rng.randrange(40, 300))
    ]
    got = {
        r[0]: r[1:]
        for r in _event_table(rows)
        .execute(ORACLES["events_active_users"])
        .fetchall()
    }
    du: dict[datetime.date, set] = {}
    for _, ts, u, _, _ in rows:
        du.setdefault(ts.date(), set()).add(u)
    expect = {}
    for day, users in du.items():
        wau = set()
        for d2, us2 in du.items():
            if 0 <= (day - d2).days <= 6:
                wau |= us2
        expect[day.isoformat()] = (
            len(users),
            len(wau),
            _rnd6(len(users) / len(wau)),
        )
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_seasonality_oracle_on_random_tables(seed):
    rng = random.Random(36_000 + seed)
    base = datetime.datetime(2025, 3, 1)
    rows = [
        (
            eid,
            base + datetime.timedelta(
                days=rng.randrange(0, 21), hours=rng.randrange(0, 24)
            ),
            1,
            "a",
            1.0,
        )
        for eid in range(1, rng.randrange(50, 400))
    ]
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _event_table(rows)
        .execute(ORACLES["events_seasonality_profile"])
        .fetchall()
    }
    counts: dict[tuple, int] = {}
    for _, ts, _, _, _ in rows:
        # Spark dayofweek: 1 = Sunday … 7 = Saturday
        dow = ((ts.weekday() + 1) % 7) + 1
        k = (dow, ts.hour)
        counts[k] = counts.get(k, 0) + 1
    total = sum(counts.values())
    assert got == {
        k: (n, _rnd6(n / total)) for k, n in counts.items()
    }, seed


@pytest.mark.parametrize("seed", range(6))
def test_market_basket_oracle_on_random_tables(seed):
    rng = random.Random(37_000 + seed)
    li = [
        (rng.randrange(1, 40), rng.randrange(1, 12))
        for _ in range(rng.randrange(60, 400))
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", li)
    got = [
        tuple(r)
        for r in con.execute(ORACLES["market_basket_pairs"]).fetchall()
    ]
    baskets: dict[int, set] = {}
    for ok, pk in li:
        baskets.setdefault(ok, set()).add(pk)
    support: dict[tuple, int] = {}
    cnt: dict[int, int] = {}
    for items in baskets.values():
        for p in items:
            cnt[p] = cnt.get(p, 0) + 1
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                support[(a, b)] = support.get((a, b), 0) + 1
    n_orders = len(baskets)
    expect = [
        (a, b, n, _rnd6(n_orders * n / (cnt[a] * cnt[b])))
        for (a, b), n in sorted(
            support.items(), key=lambda kv: (-kv[1], kv[0])
        )
    ][:20]
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_ltv_cohorts_oracle_on_random_tables(seed):
    rng = random.Random(38_000 + seed)
    n_cust = rng.randrange(5, 30)
    orders = [
        (
            rng.randrange(1, n_cust + 1),
            rng.randrange(100, 30_000) / 100.0,
            datetime.datetime(1998, 1, 1)
            + datetime.timedelta(days=rng.randrange(0, 400)),
        )
        for _ in range(rng.randrange(n_cust, n_cust * 6))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_custkey BIGINT, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", orders)
    got = {
        (r[0], r[1], r[2]): r[3:]
        for r in con.execute(ORACLES["customer_ltv_cohorts"]).fetchall()
    }
    cm: dict[tuple, int] = {}
    for ck, tp, dt in orders:
        mi = dt.year * 12 + dt.month
        cm[(ck, mi)] = cm.get((ck, mi), 0) + round(tp * 100)
    m0_of: dict[int, int] = {}
    for ck, mi in cm:
        m0_of[ck] = min(m0_of.get(ck, mi), mi)
    g: dict[tuple, list] = {}
    for (ck, mi), rc in cm.items():
        k = (m0_of[ck], mi - m0_of[ck])
        e = g.setdefault(k, [0, 0])
        e[0] += 1
        e[1] += rc
    expect = {}
    for m0 in {m for m, _ in g}:
        ks = sorted(k for m, k in g if m == m0)
        size = g[(m0, 0)][0]
        cum = 0
        for k in ks:
            n_active, rc = g[(m0, k)]
            cum += rc
            expect[((m0 - 1) // 12, (m0 - 1) % 12 + 1, k)] = (
                n_active,
                rc / 100.0,
                _rnd6(n_active / size),
                _rnd6(cum / (size * 100.0)),
            )
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_scorecard_oracle_on_random_tables(seed):
    rng = random.Random(39_000 + seed)
    n_supp = rng.randrange(3, 10)
    supp = [(sk, f"Supplier#{sk}", rng.randrange(0, 4)) for sk in range(1, n_supp + 1)]
    nations = [(nk, f"NATION{nk}") for nk in range(0, 4)]
    li = [
        (
            rng.randrange(1, n_supp + 1),
            rng.randrange(1, 20),
            rng.randrange(1_000, 500_000) / 100.0,
            rng.choice([0, 2, 5]) / 100.0,
            rng.choice(["A", "N", "R"]),
        )
        for _ in range(rng.randrange(30, 300))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE supplier(s_suppkey BIGINT, s_name VARCHAR,"
        " s_nationkey INT)"
    )
    con.executemany("INSERT INTO supplier VALUES (?, ?, ?)", supp)
    con.execute("CREATE TABLE nation(n_nationkey INT, n_name VARCHAR)")
    con.executemany("INSERT INTO nation VALUES (?, ?)", nations)
    con.execute(
        "CREATE TABLE lineitem(l_suppkey BIGINT, l_partkey BIGINT,"
        " l_extendedprice DOUBLE, l_discount DOUBLE, l_returnflag VARCHAR)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?, ?)", li)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["supplier_scorecard"]).fetchall()
    }
    agg: dict[int, list] = {}
    for sk, pk, ep, dc, rf in li:
        a = agg.setdefault(sk, [0, set(), 0, 0])
        a[0] += 1
        a[1].add(pk)
        a[2] += round(ep * 100) * (100 - round(dc * 100))
        a[3] += rf == "R"
    expect = {
        sk: (
            f"Supplier#{sk}",
            f"NATION{nkey}",
            n,
            len(parts),
            rc / 10_000.0,
            _rnd6(nr / n),
        )
        for sk, name, nkey in supp
        if sk in agg
        for n, parts, rc, nr in [agg[sk]]
    }
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_funnel_latency_oracle_on_random_tables(seed):
    rng = random.Random(40_000 + seed)
    base = datetime.datetime(2025, 4, 1)
    rows = [
        (
            eid,
            base + datetime.timedelta(seconds=rng.randrange(0, 500_000)),
            rng.randrange(1, 15),
            rng.choice(["view", "click", "purchase", "x"]),
            1.0,
        )
        for eid in range(1, rng.randrange(60, 400))
    ]
    got = {
        r[0]: r[1:]
        for r in _event_table(rows)
        .execute(ORACLES["events_funnel_latency"])
        .fetchall()
    }
    by_user: dict[int, dict[str, list]] = {}
    for _, ts, u, ty, _ in rows:
        by_user.setdefault(u, {}).setdefault(ty, []).append(_ns(ts))
    lats: dict[str, list] = {}
    for evs in by_user.values():
        if "view" not in evs:
            continue
        tv = min(evs["view"])
        clicks = [t for t in evs.get("click", []) if t > tv]
        if not clicks:
            continue
        tc = min(clicks)
        lats.setdefault("view_to_click", []).append(
            (tc - tv) // 1_000_000_000
        )
        purch = [t for t in evs.get("purchase", []) if t > tc]
        if purch:
            lats.setdefault("click_to_purchase", []).append(
                (min(purch) - tc) // 1_000_000_000
            )
    expect = {}
    for step, ls in lats.items():
        ls.sort()
        n = len(ls)
        expect[step] = (
            n,
            ls[(n + 1) // 2 - 1],
            ls[(9 * n + 9) // 10 - 1],
            _rnd6(sum(ls) / n),
        )
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_asof_join_oracle_on_random_tables(seed):
    rng = random.Random(41_000 + seed)
    base = datetime.datetime(2025, 5, 1)
    rows = []
    eid = 1
    for u in range(1, 8):
        # per-user UNIQUE event timestamps (the declared contract:
        # ambiguous equal-ts clicks are out of scope) but a click may
        # share the exact instant of a purchase only via ts reuse across
        # types being excluded too — the tie rule is exercised by gap=0
        # steps being skipped, so use strictly increasing seconds
        secs = sorted(
            rng.sample(range(0, 5_000), rng.randrange(3, 30))
        )
        for s in secs:
            rows.append(
                (
                    eid,
                    base + datetime.timedelta(seconds=s),
                    u,
                    rng.choice(["click", "purchase", "view"]),
                    1.0,
                )
            )
            eid += 1
    got = {
        r[0]: r[2]
        for r in _event_table(rows)
        .execute(ORACLES["join_asof"])
        .fetchall()
    }
    by_user: dict[int, list] = {}
    for e, ts, u, ty, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), e, ty))
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        last_click = None
        for t, e, ty in evs:
            if ty == "click":
                last_click = e
            elif ty == "purchase":
                expect[e] = last_click
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_time_interval_join_oracle_on_random_tables(seed):
    rng = random.Random(42_000 + seed)
    base = datetime.datetime(2025, 6, 1)
    rows = [
        (
            eid,
            # minute grid across ±several hours → exact one-hour
            # boundary cases (|Δt| == 3600s inclusive)
            base + datetime.timedelta(minutes=rng.randrange(0, 600)),
            rng.randrange(1, 6),
            rng.choice(["click", "purchase", "view"]),
            1.0,
        )
        for eid in range(1, rng.randrange(50, 300))
    ]
    got = {
        r[0]: r[1]
        for r in _event_table(rows)
        .execute(ORACLES["join_time_interval"])
        .fetchall()
    }
    by_user: dict[int, list] = {}
    for e, ts, u, ty, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), e, ty))
    expect = {}
    for evs in by_user.values():
        clicks = [t for t, _, ty in evs if ty == "click"]
        for t, e, ty in evs:
            if ty == "purchase":
                n = sum(1 for ct in clicks if abs(ct - t) <= 3_600_000_000_000)
                if n:
                    expect[e] = n
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_window_distribution_oracle_on_random_tables(seed):
    rng = random.Random(43_000 + seed)
    n = rng.randrange(7, 80)
    cust = [
        (ck, rng.randrange(-50_000, 100_000) / 100.0)  # deliberate ties
        for ck in range(1, n + 1)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_acctbal DOUBLE)")
    con.executemany("INSERT INTO customer VALUES (?, ?)", cust)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["window_distribution"]).fetchall()
    }
    order = sorted(cust, key=lambda r: (r[1], r[0]))
    sizes = [n // 10 + (1 if t < n % 10 else 0) for t in range(10)]
    tile_of = {}
    i = 0
    for t, size in enumerate(sizes, start=1):
        for ck, _ in order[i:i + size]:
            tile_of[ck] = t
        i += size
    # the (c_acctbal, c_custkey) tiebreak makes every rank unique, so
    # percent_rank/cume_dist are positional: (r-1)/(n-1) and r/n
    expect = {
        ck: (tile_of[ck], r / (n - 1), (r + 1) / n)
        for r, (ck, _) in enumerate(order)
    }
    assert got == expect, seed
