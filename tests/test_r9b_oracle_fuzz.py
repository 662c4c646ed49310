"""Fixture-independent fuzz of the round-9 late-addition ORACLES on
seeded random tables (the test_r9_oracle_fuzz discipline): the
shuffle-skew audit, the customer Pareto skyline, and the Theil–Sen
trend each get their registered SQL checked against from-scratch
Python (hashlib as the md5 engine, brute-force dominance, a full pair
sweep) so the formulas survive a future testdata regeneration.

Money inputs are generated as integer cents / 100.0 so the cents
quantization is representation-exact and the fuzz never trips the
Python-banker's vs DuckDB half-away rounding split on a manufactured
.5 (the fixture columns are generated the same way)."""

from __future__ import annotations

import datetime
import hashlib
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


def _md5_u32(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


@pytest.mark.parametrize("seed", range(6))
def test_skew_audit_oracle_on_random_tables(seed):
    rng = random.Random(7000 + seed)
    li = [
        (
            rng.randrange(1, 20),  # quantity (small domain → duplicates)
            rng.randrange(100, 5_000_000) / 100.0,
            rng.choice([0, 1, 2, 5, 8, 10]) / 100.0,
            rng.randrange(1, 50),  # partkey, skewed small domain
            rng.randrange(1, 8),  # suppkey, tiny domain → empty buckets
        )
        for _ in range(rng.randrange(40, 400))
    ]
    od = [(rng.randrange(1, 30),) for _ in range(rng.randrange(20, 200))]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_partkey BIGINT, l_suppkey BIGINT)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?, ?)", li)
    con.execute("CREATE TABLE orders(o_custkey BIGINT)")
    con.executemany("INSERT INTO orders VALUES (?)", od)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["stats_shuffle_skew_audit"]).fetchall()
    }
    counts: dict[str, dict[int, int]] = {}
    for q, ep, dc, pk, sk in li:
        for col, v in (
            ("l_quantity", round(q * 100)),
            ("l_extendedprice", round(ep * 100)),
            ("l_discount", round(dc * 100)),
            ("l_partkey", pk),
            ("l_suppkey", sk),
        ):
            cv = counts.setdefault(col, {})
            cv[v] = cv.get(v, 0) + 1
    for (ck,) in od:
        cv = counts.setdefault("o_custkey", {})
        cv[ck] = cv.get(ck, 0) + 1
    assert set(got) == set(counts)
    for col, cv in counts.items():
        n = sum(cv.values())
        top = max(cv.values())
        buckets: dict[int, int] = {}
        for v, c in cv.items():
            b = _md5_u32(v) % 256
            buckets[b] = buckets.get(b, 0) + c
        sizes = sorted(buckets.values())
        med = sizes[(len(sizes) + 1) // 2 - 1]
        assert got[col] == (
            n,
            len(cv),
            top * 1_000_000 // n,
            len(buckets),
            sizes[-1],
            med,
            sizes[-1] * 1000 // med,
        ), (seed, col)


@pytest.mark.parametrize("seed", range(6))
def test_pareto_skyline_oracle_on_random_tables(seed):
    rng = random.Random(8000 + seed)
    n_cust = rng.randrange(5, 60)
    segs = ["SA", "SB"]
    cust = [(ck, rng.choice(segs)) for ck in range(1, n_cust + 1)]
    orders = [
        (
            rng.randrange(1, n_cust + 1),
            rng.randrange(100, 50_000) / 100.0,
            datetime.datetime(1995, 1, 1)
            + datetime.timedelta(days=rng.randrange(0, 40)),
        )
        for _ in range(rng.randrange(n_cust, n_cust * 6))
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_mktsegment VARCHAR)")
    con.executemany("INSERT INTO customer VALUES (?, ?)", cust)
    con.execute(
        "CREATE TABLE orders(o_custkey BIGINT, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", orders)
    got = {
        (r[0], r[1], round(r[2] * 100), r[3], r[4])
        for r in con.execute(ORACLES["customer_pareto_skyline"]).fetchall()
    }
    seg_of = dict(cust)
    agg: dict[int, list] = {}
    epoch = datetime.datetime(1970, 1, 1)
    for ck, tp, dt in orders:
        a = agg.setdefault(ck, [0, 0, 0])
        a[0] += round(tp * 100)
        a[1] = max(a[1], (dt - epoch).days)
        a[2] += 1
    by_seg: dict[str, list] = {}
    for ck, (sp, ld, no) in agg.items():
        by_seg.setdefault(seg_of[ck], []).append((ck, sp, ld, no))
    expect = set()
    for seg, cs in by_seg.items():
        for ck, sp, ld, no in cs:
            if not any(
                sp2 >= sp and ld2 >= ld and (sp2 > sp or ld2 > ld)
                for _, sp2, ld2, _ in cs
            ):
                expect.add((seg, ck, sp, ld, no))
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_theil_sen_oracle_on_random_tables(seed):
    rng = random.Random(9000 + seed)
    base = datetime.datetime(2021, 3, 1)
    n_hours_span = rng.randrange(3, 40)
    # a drifting rate makes the slope genuinely nonzero on most seeds
    ts = [
        base
        + datetime.timedelta(
            hours=h, seconds=rng.randrange(0, 3600)
        )
        for h in range(n_hours_span)
        for _ in range(rng.randrange(0, 3 + h // 4))
    ]
    if len(ts) < 3:
        ts = [base, base + datetime.timedelta(hours=1, seconds=30)]
    con = duckdb.connect()
    con.execute("CREATE TABLE events(ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?)", [(t,) for t in ts])
    row = con.execute(ORACLES["events_theil_sen_trend"]).fetchall()[0]
    epoch = datetime.datetime(1970, 1, 1)
    hours = [
        int((t - epoch).total_seconds()) // 3600 for t in ts
    ]
    lo, hi = min(hours), max(hours)
    xs = [0] * (hi - lo + 1)
    for h in hours:
        xs[h - lo] += 1
    n = len(xs)
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    npairs = len(slopes)
    sen = slopes[(npairs + 1) // 2 - 1]
    sx = sum(range(n))
    sxx = sum(i * i for i in range(n))
    sy = sum(xs)
    sxy = sum(i * x for i, x in enumerate(xs))
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row[0] == n and row[1] == npairs, seed
    assert row[2] == round(sen, 6) and row[3] == round(ols, 6), seed


@pytest.mark.parametrize("seed", range(6))
def test_attribution_oracle_on_random_tables(seed):
    rng = random.Random(10_000 + seed)
    types = ["view", "click", "purchase", "error", "signup"]
    base = datetime.datetime(2022, 6, 1)
    rows = []
    for eid in range(1, rng.randrange(30, 300)):
        rows.append(
            (
                eid,
                base
                + datetime.timedelta(
                    # coarse grid → deliberate same-timestamp ties
                    minutes=rng.randrange(0, 20_000) * 60
                ),
                rng.randrange(1, 12),
                rng.choice(types),
                rng.randrange(0, 10_000_000) / 1e6,
            )
        )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = {
        r[0]: r[1:]
        for r in con.execute(
            ORACLES["events_attribution_last_touch"]
        ).fetchall()
    }
    epoch = datetime.datetime(1970, 1, 1)

    def ns(t):
        return int((t - epoch) // datetime.timedelta(microseconds=1)) * 1000

    by_user: dict[int, list] = {}
    for eid, t, u, ty, v in rows:
        if ty in ("view", "click", "purchase"):
            by_user.setdefault(u, []).append((ns(t), eid, ty, round(v * 1e6)))
    acc: dict[str, list] = {}
    for evs in by_user.values():
        evs.sort()
        last = None  # (t, type) of most recent preceding touch
        for t, eid, ty, mv in evs:
            if ty == "purchase":
                if last is not None and last[0] >= t - 604_800_000_000_000:
                    a = acc.setdefault(last[1], [0, 0, 0, 0])
                    a[2] += (t - last[0]) // 1_000_000_000
                    a[3] += 1
                else:
                    a = acc.setdefault("none", [0, 0, 0, 0])
                a[0] += 1
                a[1] += mv
            else:
                last = (t, ty)
    assert set(got) == set(acc), seed
    for k, (n, mv, lat, nlat) in acc.items():
        gn, gv, gl = got[k]
        assert gn == n and gv == mv / 1e6, (seed, k)
        assert gl == (round(lat / nlat, 6) if nlat else None), (seed, k)


@pytest.mark.parametrize("seed", range(6))
def test_novelty_oracle_on_random_tables(seed):
    rng = random.Random(11_000 + seed)
    vocab = [f"w{i}" for i in range(rng.randrange(4, 40))]
    docs = {}
    for _ in range(rng.randrange(12, 120)):
        d = rng.randrange(0, 500)
        if d not in docs:
            docs[d] = " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(1, 9))
            )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(docs.items()))
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["text_novelty_curve"]).fetchall()
    }
    mn, mx = min(docs), max(docs)
    first: dict[str, int] = {}
    for d in sorted(docs):
        for w in set(docs[d].split(" ")):
            first.setdefault(w, d)
    agg: dict[int, list] = {}
    for d, text in docs.items():
        b = (d - mn) * 10 // (mx - mn + 1)
        a = agg.setdefault(b, [0, 0, 0])
        a[0] += 1
        ws = set(text.split(" "))
        a[1] += len(ws)
        a[2] += sum(1 for w in ws if first[w] == d)
    expect = {
        b: (nd, ng, nn, nn * 1_000_000 // ng)
        for b, (nd, ng, nn) in agg.items()
    }
    assert got == expect, seed


def _rand_events(rng, n_users=6, n_hours=8, n=120):
    base = datetime.datetime(2023, 1, 1)
    types = ["a", "b", "c"]
    return [
        (
            base + datetime.timedelta(
                hours=rng.randrange(0, n_hours),
                seconds=rng.randrange(0, 3600),
            ),
            rng.randrange(1, n_users + 1),
            rng.choice(types),
            # signed cents/100 → micro- and cent-quantization both exact;
            # zero-sum cells occur deliberately
            rng.choice([-200, -100, 0, 100, 100, 250, 999]) / 100.0,
        )
        for _ in range(rng.randrange(20, n))
    ]


@pytest.mark.parametrize("seed", range(6))
def test_tensor_skew_oracle_on_random_tables(seed):
    rng = random.Random(12_000 + seed)
    rows = _rand_events(rng)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["tensor_mode_skew_profile"]).fetchall()
    }
    epoch = datetime.datetime(1970, 1, 1)
    cells: dict[tuple, int] = {}
    for t, u, ty, v in rows:
        h = int((t - epoch).total_seconds()) // 3600
        k = (u, ty, h)
        cells[k] = cells.get(k, 0) + round(v * 1_000_000)
    nz = [k for k, vm in cells.items() if vm != 0]
    for mode, pos in (("i", 0), ("j", 1), ("k", 2)):
        per: dict = {}
        for k in nz:
            per[k[pos]] = per.get(k[pos], 0) + 1
        sizes = sorted(per.values())
        med = sizes[(len(sizes) + 1) // 2 - 1]
        assert got[mode] == (
            len(per),
            len(nz),
            sizes[0],
            sizes[-1],
            med,
            sizes[-1] * 1_000_000 // len(nz),
        ), (seed, mode)


@pytest.mark.parametrize("seed", range(6))
def test_tensor_gram_oracle_on_random_tables(seed):
    rng = random.Random(13_000 + seed)
    rows = _rand_events(rng)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(ORACLES["tensor_unfold_gram_type"]).fetchall()
    }
    epoch = datetime.datetime(1970, 1, 1)
    cells: dict[tuple, dict] = {}
    for t, u, ty, v in rows:
        h = int((t - epoch).total_seconds()) // 3600
        d = cells.setdefault((u, h), {})
        d[ty] = d.get(ty, 0) + round(v * 100)
    gram: dict[tuple, list] = {}
    for per_t in cells.values():
        per_t = {t: cm for t, cm in per_t.items() if cm != 0}
        for ta, ca in per_t.items():
            for tb, cb in per_t.items():
                g = gram.setdefault((ta, tb), [0, 0])
                g[0] += 1
                g[1] += ca * cb
    assert got == {k: tuple(v) for k, v in gram.items()}, seed


@pytest.mark.parametrize("seed", range(6))
def test_eqdepth_oracle_on_random_tables(seed):
    rng = random.Random(18_000 + seed)
    li = [
        (
            rng.randrange(1, 15),
            rng.randrange(100, 300_000) / 100.0,
            rng.choice([0, 1, 2, 5]) / 100.0,
            rng.randrange(1, 40),
            rng.randrange(1, 6),
        )
        for _ in range(rng.randrange(30, 300))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE, l_partkey BIGINT, l_suppkey BIGINT)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?, ?)", li)
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(
            ORACLES["stats_eqdepth_histogram_lineitem"]
        ).fetchall()
    }
    counts: dict[str, dict[int, int]] = {}
    for q, ep, dc, pk, sk in li:
        for col, v in (
            ("l_quantity", round(q * 100)),
            ("l_extendedprice", round(ep * 100)),
            ("l_discount", round(dc * 100)),
            ("l_partkey", pk),
            ("l_suppkey", sk),
        ):
            cv = counts.setdefault(col, {})
            cv[v] = cv.get(v, 0) + 1
    expect: dict[tuple, list] = {}
    for col, cv in counts.items():
        n = sum(cv.values())
        lo = 0
        for v in sorted(cv):
            b = lo * 10 // n
            e = expect.setdefault((col, b), [0, 0, v, v])
            e[0] += cv[v]
            e[1] += 1
            e[3] = v
            lo += cv[v]
    assert got == {k: tuple(v) for k, v in expect.items()}, seed
