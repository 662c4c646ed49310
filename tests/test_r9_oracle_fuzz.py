"""Fixture-independent fuzz of the round-9 ORACLES on seeded random
tables (the test_rankstat_oracle_fuzz / test_bi_oracle_fuzz discipline):
Tukey fences, the incremental-dedup audit, the shard manifest, band
migration, overdispersion, and the watermark-late replay each get their
registered SQL checked against from-scratch Python (hashlib as the md5
engine) so the formulas survive a future testdata regeneration."""

from __future__ import annotations

import hashlib
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


@pytest.mark.parametrize("seed", range(6))
def test_tukey_oracle_on_random_tables(seed):
    rng = random.Random(5000 + seed)
    rows = []
    for _ in range(rng.randrange(30, 400)):
        # heavy-tailed positives plus occasional spikes → real outliers
        v = rng.random() * rng.choice([3.0, 50.0]) + (
            500.0 if rng.random() < 0.02 else 0.0
        )
        rows.append((rng.choice(["a", "b"]), v))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["events_tukey_fences"]).fetchall()
    }
    by_type: dict[str, list[int]] = {}
    for t, v in rows:
        by_type.setdefault(t, []).append(round(v * 1_000_000))
    for t, xs in by_type.items():
        xs.sort()
        n = len(xs)
        q1m = xs[(n + 3) // 4 - 1]
        q3m = xs[(3 * n + 3) // 4 - 1]
        iqr = q3m - q1m
        n_low = sum(1 for v in xs if 2 * v < 2 * q1m - 3 * iqr)
        n_high = sum(1 for v in xs if 2 * v > 2 * q3m + 3 * iqr)
        gn, gq1, gq3, gl, gh = got[t]
        assert gn == n and (gl, gh) == (n_low, n_high), (seed, t)
        assert round(gq1 * 1e6) == q1m and round(gq3 * 1e6) == q3m


@pytest.mark.parametrize("seed", range(6))
def test_incremental_audit_oracle_on_random_tables(seed):
    rng = random.Random(6000 + seed)
    vocab = [f"w{i}" for i in range(rng.randrange(3, 12))]
    docs = []
    used = set()
    for _ in range(rng.randrange(10, 150)):
        d = rng.randrange(1, 10_000)
        if d in used:
            continue
        used.add(d)
        docs.append(
            (d, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(1, 6))))
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["dedup_incremental_audit"]).fetchall()
    }

    def fp(t):
        return hashlib.md5(
            " ".join(sorted(set(t.split(" ")))).encode()
        ).hexdigest()

    cutoff = max(d for d, _ in docs) * 4 // 5
    base = [(d, fp(t)) for d, t in docs if d <= cutoff]
    inc = [(d, fp(t)) for d, t in docs if d > cutoff]
    base_fps = {f for _, f in base}
    inc_fps = {f for _, f in inc}
    first: dict[str, int] = {}
    for d, f in sorted(base + inc):
        first.setdefault(f, d)
    expect = {
        "base": (
            len(base),
            len(base_fps),
            sum(1 for f, d in first.items() if d <= cutoff),
        ),
        "increment": (len(inc), len(inc_fps), len(inc_fps - base_fps)),
    }
    assert {k: v[:3] for k, v in got.items()} == expect, seed
    for k in got:
        assert got[k][3] == got[k][1] - got[k][2]
    assert got["base"][3] == 0  # the structural contract, on ANY table


@pytest.mark.parametrize("seed", range(6))
def test_shard_manifest_oracle_on_random_tables(seed):
    rng = random.Random(7000 + seed)
    docs = {}
    for _ in range(rng.randrange(5, 120)):
        docs[rng.randrange(1, 5000)] = " ".join(
            f"t{rng.randrange(50)}" for _ in range(rng.randrange(1, 9))
        )
    docs = sorted(docs.items())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = {
        r[0]: r[1:]
        for r in con.execute(ORACLES["pipeline_shard_manifest"]).fetchall()
    }
    man: dict[str, list] = {}
    for d, t in docs:
        b = hashlib.md5(str(d).encode()).hexdigest()[:1]
        m = man.setdefault(b, [0, 0, 0, None, None, 0])
        m[0] += 1
        m[1] += len(t.split(" "))
        m[2] += len(t)
        m[3] = d if m[3] is None else min(m[3], d)
        m[4] = d if m[4] is None else max(m[4], d)
        dg = hashlib.md5(t.encode()).hexdigest()
        m[5] += int(hashlib.md5(dg.encode()).hexdigest()[:8], 16)
    assert got == {b: tuple(m) for b, m in man.items()}, seed


@pytest.mark.parametrize("seed", range(6))
def test_band_migration_oracle_on_random_tables(seed):
    from paraslice_spark.operators.reshape import (
        _MIG_HIGH_C,
        _MIG_LOW_C,
    )

    rng = random.Random(8000 + seed)
    n_cust = rng.randrange(3, 60)
    orders = []
    for _ in range(rng.randrange(0, 5 * n_cust)):
        orders.append(
            (
                rng.randrange(1, n_cust + 1),
                rng.randrange(1, 60_000_000) / 100.0,
                ("1993-05-%02d" if rng.random() < 0.5 else "1997-03-%02d")
                % rng.randrange(1, 29),
            )
        )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_custkey BIGINT, o_totalprice DOUBLE,"
        " o_orderdate DATE)"
    )
    con.executemany(
        "INSERT INTO orders VALUES (?, ?, CAST(? AS DATE))", orders
    )
    con.execute("CREATE TABLE customer(c_custkey BIGINT)")
    con.executemany(
        "INSERT INTO customer VALUES (?)",
        [(c,) for c in range(1, n_cust + 1)],
    )
    got = {
        (r[0], r[1]): (r[2], round(r[3] * 100))
        for r in con.execute(ORACLES["customer_band_migration"]).fetchall()
    }
    spend = {c: [0, 0] for c in range(1, n_cust + 1)}
    for ck, p, d in orders:
        spend[ck][0 if d.startswith("1993") else 1] += round(p * 100)

    def band(c):
        if c == 0:
            return "none"
        if c < _MIG_LOW_C:
            return "low"
        if c < _MIG_HIGH_C:
            return "mid"
        return "high"

    expect: dict[tuple, list] = {}
    for h1, h2 in spend.values():
        e = expect.setdefault((band(h1), band(h2)), [0, 0])
        e[0] += 1
        e[1] += h1 + h2
    assert got == {k: tuple(v) for k, v in expect.items()}, seed


@pytest.mark.parametrize("seed", range(6))
def test_overdispersion_oracle_on_random_tables(seed):
    rng = random.Random(9000 + seed)
    base_us = 1_600_000_000_000_000
    # bursty arrivals (clustered) so D departs from 1 both ways
    ts_us = []
    t = base_us
    for _ in range(rng.randrange(20, 400)):
        t += rng.choice([1, 1, 1, 600]) * rng.randrange(1, 90) * 1_000_000
        for _ in range(rng.randrange(1, 4)):
            ts_us.append(t + rng.randrange(0, 1_000_000))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (make_timestamp(?))",
        [(u,) for u in ts_us],
    )
    [(gn, gsk, gsk2, gd)] = con.execute(
        ORACLES["events_overdispersion"]
    ).fetchall()
    mins = [u * 1000 // 60_000_000_000 for u in ts_us]
    lo, hi = min(mins), max(mins)
    xs = [0] * (hi - lo + 1)
    for m in mins:
        xs[m - lo] += 1
    n, sk, sk2 = len(xs), sum(xs), sum(x * x for x in xs)
    assert (gn, gsk, gsk2) == (n, sk, sk2), seed
    assert abs(gd - round((n * sk2 - sk * sk) / ((n - 1) * sk), 6)) < 5e-7


@pytest.mark.parametrize("seed", range(4))
def test_watermark_replay_oracle_on_random_tables(seed):
    from paraslice_spark.operators.reshape import WM_DELAY_NS

    rng = random.Random(11_000 + seed)
    base_ns = 1_650_000_000_000_000_000
    rows = []
    used = set()
    for _ in range(rng.randrange(50, 600)):
        e = rng.randrange(1, 100_000)
        if e in used:
            continue
        used.add(e)
        rows.append(
            (e, (base_ns + rng.randrange(0, 40) * 3_600_000_000_000
                 + rng.randrange(0, 3_600_000_000_000)) // 1000)
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (?, make_timestamp(?))", rows
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            ORACLES["events_watermark_late_replay"]
        ).fetchall()
    }
    arrival = sorted(
        rows,
        key=lambda r: (
            int(hashlib.md5(str(r[0]).encode()).hexdigest()[:8], 16),
            r[0],
        ),
    )
    expect: dict[int, list] = {}
    prefix = None
    for _e, us in arrival:
        ns = us * 1000
        hr = ns // 3_600_000_000_000
        hr_end = (hr + 1) * 3_600_000_000_000
        late = prefix is not None and prefix - WM_DELAY_NS >= hr_end
        x = expect.setdefault(hr, [0, 0])
        x[0] += 1
        x[1] += int(late)
        prefix = ns if prefix is None else max(prefix, ns)
    assert got == {h: tuple(v) for h, v in expect.items()}, seed


@pytest.mark.parametrize("seed", range(4))
def test_delay_sweep_oracle_on_random_tables(seed):
    from paraslice_spark.operators.reshape import _WM_SWEEP_S

    rng = random.Random(12_000 + seed)
    base_ns = 1_660_000_000_000_000_000
    rows = []
    used = set()
    for _ in range(rng.randrange(50, 500)):
        e = rng.randrange(1, 100_000)
        if e in used:
            continue
        used.add(e)
        rows.append(
            (e, (base_ns + rng.randrange(0, 30) * 3_600_000_000_000
                 + rng.randrange(0, 3_600_000_000_000)) // 1000)
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP)")
    con.executemany(
        "INSERT INTO events VALUES (?, make_timestamp(?))", rows
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            ORACLES["events_watermark_delay_sweep"]
        ).fetchall()
    }
    arrival = sorted(
        rows,
        key=lambda r: (
            int(hashlib.md5(str(r[0]).encode()).hexdigest()[:8], 16),
            r[0],
        ),
    )
    for d in _WM_SWEEP_S:
        prefix, n_late = None, 0
        for _e, us in arrival:
            ns = us * 1000
            hr_end = (ns // 3_600_000_000_000 + 1) * 3_600_000_000_000
            if prefix is not None and prefix - d * 1_000_000_000 >= hr_end:
                n_late += 1
            prefix = ns if prefix is None else max(prefix, ns)
        n = len(arrival)
        assert got[d] == (n, n_late, n_late * 1_000_000 // n), (seed, d)
