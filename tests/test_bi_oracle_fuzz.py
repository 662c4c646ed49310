"""Fixture-independent fuzz of the r8 BI-statistic ORACLES (VERDICT r8
next-round #8): on seeded random tables the registered SQL for
customer_gini_by_nation, supplier_hhi_by_type, events_value_drift_psi,
and orders_benford_audit must match a from-scratch naive Python
computation — the test_rankstat_oracle_fuzz discipline, so the formulas
survive a future testdata regeneration.  Pure DuckDB (no Spark session
needed); fuzz inputs respect each oracle's documented domain contracts
(non-negative values, positive prices, both PSI windows populated)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


@pytest.mark.parametrize("seed", range(8))
def test_gini_oracle_on_random_tables(seed):
    rng = random.Random(1000 + seed)
    n_nations = rng.randrange(1, 6)
    n_cust = rng.randrange(5, 120)
    custs = {
        ck: rng.randrange(n_nations) for ck in range(1, n_cust + 1)
    }
    orders = []
    for _ in range(rng.randrange(n_cust, 4 * n_cust)):
        ck = rng.randrange(1, n_cust + 1)
        # prices in cents/100; heavy ties at small vmax
        orders.append((ck, rng.randrange(1, rng.choice([5, 1000])) * 1.0))
    con = duckdb.connect()
    con.execute("CREATE TABLE orders(o_custkey BIGINT, o_totalprice DOUBLE)")
    con.executemany("INSERT INTO orders VALUES (?, ?)", orders)
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_nationkey BIGINT)")
    con.executemany("INSERT INTO customer VALUES (?, ?)", list(custs.items()))
    con.execute("CREATE TABLE nation(n_nationkey BIGINT, n_name VARCHAR)")
    con.executemany(
        "INSERT INTO nation VALUES (?, ?)",
        [(k, f"NATION_{k}") for k in range(n_nations)],
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["customer_gini_by_nation"]).fetchall()
    }
    spend: dict[int, int] = {}
    for ck, p in orders:
        spend[ck] = spend.get(ck, 0) + round(p * 100)
    by_nation: dict[str, list] = {}
    for ck, c in spend.items():
        by_nation.setdefault(f"NATION_{custs[ck]}", []).append((c, ck))
    assert set(got) == set(by_nation)
    for nat, xs in by_nation.items():
        xs.sort()
        n = len(xs)
        s1 = sum(c for c, _ in xs)
        s2 = sum((i + 1) * c for i, (c, _) in enumerate(xs))
        gini = (2 * s2 - (n + 1) * s1) / (n * s1)
        gn, grev, ggini = got[nat]
        assert gn == n
        assert round(grev * 100) == s1
        assert abs(ggini - round(gini, 6)) < 5e-7, (seed, nat)


@pytest.mark.parametrize("seed", range(8))
def test_hhi_oracle_on_random_tables(seed):
    rng = random.Random(2000 + seed)
    n_parts, n_supp = rng.randrange(2, 30), rng.randrange(1, 15)
    types = [f"TYPE_{i}" for i in range(rng.randrange(1, 5))]
    part = [(pk, rng.choice(types)) for pk in range(1, n_parts + 1)]
    line = [
        (
            rng.randrange(1, n_parts + 1),
            rng.randrange(1, n_supp + 1),
            rng.randrange(1, 60) * 1.0,
        )
        for _ in range(rng.randrange(10, 400))
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE part(p_partkey BIGINT, p_type VARCHAR)")
    con.executemany("INSERT INTO part VALUES (?, ?)", part)
    con.execute(
        "CREATE TABLE lineitem(l_partkey BIGINT, l_suppkey BIGINT,"
        " l_quantity DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?)", line)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["supplier_hhi_by_type"]).fetchall()
    }
    ptype = dict(part)
    q: dict[tuple, int] = {}
    for pk, sk, qty in line:
        key = (ptype[pk], sk)
        q[key] = q.get(key, 0) + round(qty * 100)
    by_type: dict[str, list] = {}
    for (t, _sk), qc in q.items():
        by_type.setdefault(t, []).append(qc)
    assert set(got) == set(by_type)
    for t, qs in by_type.items():
        tot = sum(qs)
        hhi = sum(x * x for x in qs) / (float(tot) * tot)
        n_s, total_qty, ghhi, gtop = got[t]
        assert n_s == len(qs)
        assert round(total_qty * 100) == tot
        assert abs(ghhi - round(hhi, 6)) < 5e-7, (seed, t)
        assert abs(gtop - round(max(qs) / tot, 6)) < 5e-7, (seed, t)


@pytest.mark.parametrize("seed", range(8))
def test_psi_oracle_on_random_tables(seed):
    rng = random.Random(3000 + seed)
    n = rng.randrange(20, 500)
    base_us = 1_700_000_000_000_000
    rows = []
    for i in range(n):
        # non-negative values (documented integer-div domain contract);
        # second half drifts upward so PSI is non-vacuous
        drift = 30.0 if i >= n // 2 else 0.0
        rows.append(
            (
                base_us + i * 60_000_000 + rng.randrange(0, 50_000_000),
                rng.random() * rng.choice([4.0, 80.0]) + drift,
            )
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(ts TIMESTAMP, value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES (make_timestamp(?), ?)", rows
    )
    got = con.execute(ORACLES["events_value_drift_psi"]).fetchall()
    mid = (min(r[0] for r in rows) + max(r[0] for r in rows)) * 1000 // 2
    hist: dict[int, list] = {}
    for us, v in rows:
        b = round(v * 1_000_000) // 2_000_000
        h = hist.setdefault(b, [0, 0])
        h[0 if us * 1000 <= mid else 1] += 1
    t1 = sum(h[0] for h in hist.values())
    t2 = sum(h[1] for h in hist.values())
    nb = len(hist)
    assert {r[0] for r in got} == set(hist)
    for b, n1, n2, psi in got:
        assert (n1, n2) == tuple(hist[b])
        p = (n1 + 1) / (t1 + nb)
        q = (n2 + 1) / (t2 + nb)
        assert abs(psi - round((p - q) * math.log(p / q), 6)) < 5e-7, (
            seed,
            b,
        )


@pytest.mark.parametrize("seed", range(8))
def test_benford_oracle_on_random_tables(seed):
    rng = random.Random(4000 + seed)
    n = rng.randrange(20, 600)
    # positive prices spanning several magnitudes (first-digit domain)
    prices = [
        rng.randrange(1, 10) * 10 ** rng.randrange(0, 6)
        + rng.randrange(0, 100) / 100.0
        for _ in range(n)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE orders(o_totalprice DOUBLE)")
    con.executemany("INSERT INTO orders VALUES (?)", [(p,) for p in prices])
    got = con.execute(ORACLES["orders_benford_audit"]).fetchall()
    benford = {
        1: 0.30103, 2: 0.17609126, 3: 0.12493874, 4: 0.09691001,
        5: 0.07918125, 6: 0.06694679, 7: 0.05799195, 8: 0.05115252,
        9: 0.04575749,
    }
    cnt: dict[int, int] = {}
    for p in prices:
        d = int(str(round(p * 100))[0])
        cnt[d] = cnt.get(d, 0) + 1
    total = sum(cnt.values())
    assert {r[0] for r in got} == set(cnt)
    for d, gn, freq, bp, chi in got:
        assert gn == cnt[d]
        assert abs(freq - round(cnt[d] / total, 6)) < 5e-7
        assert bp == benford[d]
        e = total * benford[d]
        assert abs(chi - round((cnt[d] - e) ** 2 / e, 6)) < 5e-7, (seed, d)
