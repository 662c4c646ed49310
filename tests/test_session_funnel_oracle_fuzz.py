"""Fixture-independent fuzz of the SESSIONIZE and FUNNEL oracles on
seeded random event tables (extending the r8/r9 fuzz discipline to the
oldest behavioral-analytics oracles, which until now were validated
only on the fixture): gap-boundary ties (exactly 30 min → same
session, strictly-greater rule) and same-timestamp stage collisions
(click at the same ns as the view → NOT counted, strictly-after rule)
are generated deliberately."""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.operators.reshape import SESSION_GAP_NS
from paraslice_spark.registry import ORACLES

_EPOCH = datetime.datetime(1970, 1, 1)


def _ns(t: datetime.datetime) -> int:
    return int((t - _EPOCH) // datetime.timedelta(microseconds=1)) * 1000


@pytest.mark.parametrize("seed", range(6))
def test_sessionize_oracle_on_random_tables(seed):
    rng = random.Random(14_000 + seed)
    base = datetime.datetime(2024, 2, 1)
    rows = []
    t = {u: base for u in range(1, 6)}
    for eid in range(1, rng.randrange(30, 250)):
        u = rng.randrange(1, 6)
        # steps from a menu that includes 0 (same-ts tie) and EXACTLY the
        # 30-min gap (same session under the strict-> rule)
        step = rng.choice([0, 1, 60, 1799, 1800, 1801, 7200])
        t[u] = t[u] + datetime.timedelta(seconds=step)
        rows.append((eid, t[u], u, rng.choice(["a", "b"]), 1.0))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(ORACLES["events_sessionize"]).fetchall()
    }
    by_user: dict[int, list] = {}
    for eid, ts, u, _, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), eid))
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        idx, prev = 0, None
        for tns, eid in evs:
            if prev is None or tns - prev > SESSION_GAP_NS:
                idx += 1
            prev = tns
            expect[eid] = (u, idx)
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_funnel_oracle_on_random_tables(seed):
    rng = random.Random(15_000 + seed)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for eid in range(1, rng.randrange(40, 300)):
        rows.append(
            (
                eid,
                # second-granularity grid → frequent exact-ts collisions
                base + datetime.timedelta(seconds=rng.randrange(0, 50)),
                rng.randrange(1, 10),
                rng.choice(["view", "click", "purchase", "error"]),
                1.0,
            )
        )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = {
        r[0]: r[2] for r in con.execute(ORACLES["events_funnel"]).fetchall()
    }
    by_user: dict[int, dict[str, list]] = {}
    for eid, ts, u, ty, _ in rows:
        by_user.setdefault(u, {}).setdefault(ty, []).append(_ns(ts))
    n_v = n_c = n_p = 0
    for evs in by_user.values():
        if "view" not in evs:
            continue
        n_v += 1
        tv = min(evs["view"])
        clicks = [t for t in evs.get("click", []) if t > tv]
        if not clicks:
            continue
        n_c += 1
        tc = min(clicks)
        if any(t > tc for t in evs.get("purchase", [])):
            n_p += 1
    assert got == {1: n_v, 2: n_c, 3: n_p}, seed


@pytest.mark.parametrize("seed", range(6))
def test_retention_oracle_on_random_tables(seed):
    rng = random.Random(16_000 + seed)
    base = datetime.datetime(2024, 4, 1)
    rows = [
        (
            eid,
            base + datetime.timedelta(
                days=rng.randrange(0, 12), seconds=rng.randrange(0, 86_400)
            ),
            rng.randrange(1, 8),
            "a",
            1.0,
        )
        for eid in range(1, rng.randrange(30, 250))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(ORACLES["events_retention"]).fetchall()
    }
    act = {(_ns(ts) // 86_400_000_000_000, u) for _, ts, u, _, _ in rows}
    cohort: dict[int, int] = {}
    for d, u in sorted(act):
        cohort.setdefault(u, d)
    expect: dict[tuple, int] = {}
    for d, u in act:
        off = d - cohort[u]
        if 0 <= off <= 7:
            k = (cohort[u], off)
            expect[k] = expect.get(k, 0) + 1
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_scd2_oracle_on_random_tables(seed):
    rng = random.Random(17_000 + seed)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    t = {u: base for u in range(1, 5)}
    for eid in range(1, rng.randrange(20, 200)):
        u = rng.randrange(1, 5)
        # 0-second steps manufacture same-ts ties broken by event_id
        t[u] = t[u] + datetime.timedelta(seconds=rng.choice([0, 5, 900]))
        rows.append((eid, t[u], u, rng.choice(["s1", "s2", "s3"]), 1.0))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(ORACLES["events_scd2_status"]).fetchall()
    }
    by_user: dict[int, list] = {}
    for eid, ts, u, st, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), eid, st))
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        runs = []  # (status, first_ns, n)
        for tns, _, st in evs:
            if not runs or runs[-1][0] != st:
                runs.append([st, tns, 1])
            else:
                runs[-1][2] += 1
        for ver, (st, frm, n) in enumerate(runs, start=1):
            to = runs[ver][1] if ver < len(runs) else None
            expect[(u, ver)] = (st, frm, to, n)
    assert got == expect, seed


def _rand_event_log(rng, n_users=6, types=("a", "b", "c")):
    base = datetime.datetime(2024, 6, 1)
    rows = []
    for eid in range(1, rng.randrange(25, 250)):
        rows.append(
            (
                eid,
                # coarse grid → same-ts ties resolved by event_id
                base + datetime.timedelta(
                    days=rng.randrange(0, 9), seconds=rng.randrange(0, 30)
                ),
                rng.randrange(1, n_users + 1),
                rng.choice(types),
                1.0,
            )
        )
    return rows


def _event_table(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    return con


def _bigrams(rows):
    by_user: dict[int, list] = {}
    for eid, ts, u, ty, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), eid, ty))
    counts: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts


@pytest.mark.parametrize("seed", range(6))
def test_topk_paths_oracle_on_random_tables(seed):
    rng = random.Random(19_000 + seed)
    rows = _rand_event_log(rng)
    got = _event_table(rows).execute(ORACLES["events_topk_paths"]).fetchall()
    counts = _bigrams(rows)
    expect = sorted(
        ((a, b, n) for (a, b), n in counts.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:10]
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_markov_oracle_on_random_tables(seed):
    rng = random.Random(20_000 + seed)
    rows = _rand_event_log(rng)
    got = {
        (r[0], r[1]): r[2:]
        for r in _event_table(rows)
        .execute(ORACLES["events_markov_transitions"])
        .fetchall()
    }
    counts = _bigrams(rows)
    row_n: dict[str, int] = {}
    for (a, _), n in counts.items():
        row_n[a] = row_n.get(a, 0) + n
    expect = {
        (a, b): (n, round(n / row_n[a], 6)) for (a, b), n in counts.items()
    }
    assert got == expect, seed
    # row-stochastic sanity: each from-row's probabilities sum to ~1
    for a, tot in row_n.items():
        s = sum(n for (x, _), (n, _) in got.items() if x == a)
        assert s == tot


@pytest.mark.parametrize("seed", range(6))
def test_streaks_oracle_on_random_tables(seed):
    rng = random.Random(21_000 + seed)
    rows = _rand_event_log(rng)
    got = {
        r[0]: r[1:]
        for r in _event_table(rows).execute(ORACLES["events_streaks"]).fetchall()
    }
    days: dict[int, set] = {}
    for _, ts, u, _, _ in rows:
        days.setdefault(u, set()).add(_ns(ts) // 86_400_000_000_000)
    expect = {}
    for u, ds in days.items():
        sd = sorted(ds)
        streaks = [1]
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                streaks[-1] += 1
            else:
                streaks.append(1)
        expect[u] = (max(streaks), len(streaks))
    assert got == expect, seed


def _sessions(rows):
    """(user → list of (session_idx, [(ns, eid, ty), ...])) under the
    >30-min-gap rule — the shared from-scratch sessionizer."""
    by_user: dict[int, list] = {}
    for eid, ts, u, ty, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), eid, ty))
    out: dict[int, list] = {}
    for u, evs in by_user.items():
        evs.sort()
        sess: list = []
        prev = None
        for e in evs:
            if prev is None or e[0] - prev > SESSION_GAP_NS:
                sess.append([])
            sess[-1].append(e)
            prev = e[0]
        out[u] = sess
    return out


@pytest.mark.parametrize("seed", range(6))
def test_sessionized_funnel_oracle_on_random_tables(seed):
    rng = random.Random(22_000 + seed)
    base = datetime.datetime(2024, 7, 1)
    rows = []
    t = {u: base for u in range(1, 6)}
    for eid in range(1, rng.randrange(30, 250)):
        u = rng.randrange(1, 6)
        t[u] = t[u] + datetime.timedelta(
            seconds=rng.choice([0, 1, 30, 400, 2000])
        )
        rows.append(
            (eid, t[u], u, rng.choice(["view", "click", "purchase", "x"]), 1.0)
        )
    got = {
        (r[0], r[1]): r[2:]
        for r in _event_table(rows)
        .execute(ORACLES["events_sessionized_funnel"])
        .fetchall()
    }
    expect = {}
    for u, sess in _sessions(rows).items():
        for idx, evs in enumerate(sess, start=1):
            tv = min((n for n, _, ty in evs if ty == "view"), default=None)
            if tv is None:
                continue
            tc = min(
                (n for n, _, ty in evs if ty == "click" and n > tv),
                default=None,
            )
            tp = (
                min(
                    (n for n, _, ty in evs if ty == "purchase" and n > tc),
                    default=None,
                )
                if tc is not None
                else None
            )
            stage = 1 + (tc is not None) + (tp is not None)
            expect[(u, idx)] = (tv, tc, tp, stage)
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_session_concurrency_oracle_on_random_tables(seed):
    rng = random.Random(23_000 + seed)
    base = datetime.datetime(2024, 8, 1)
    rows = []
    t = {u: base for u in range(1, 6)}
    for eid in range(1, rng.randrange(25, 200)):
        u = rng.randrange(1, 6)
        t[u] = t[u] + datetime.timedelta(
            seconds=rng.choice([0, 10, 1200, 1900, 9000])
        )
        rows.append((eid, t[u], u, "a", 1.0))
    got = {
        r[0]: (r[1], r[2])
        for r in _event_table(rows)
        .execute(ORACLES["events_session_concurrency"])
        .fetchall()
    }
    hours: dict[int, list] = {}
    for u, sess in _sessions(rows).items():
        for evs in sess:
            sh = evs[0][0] // 3_600_000_000_000
            eh = evs[-1][0] // 3_600_000_000_000
            for hr in range(sh, eh + 1):
                hours.setdefault(hr, []).append(u)
    expect = {hr: (len(us), len(set(us))) for hr, us in hours.items()}
    assert got == expect, seed


@pytest.mark.parametrize("seed", range(6))
def test_interarrival_oracle_on_random_tables(seed):
    rng = random.Random(24_000 + seed)
    base = datetime.datetime(2024, 9, 1)
    rows = []
    t = {u: base for u in range(1, 5)}
    for eid in range(1, rng.randrange(25, 200)):
        u = rng.randrange(1, 5)
        # exact power-of-two µs gaps land on bucket boundaries
        t[u] = t[u] + datetime.timedelta(
            microseconds=rng.choice([0, 1, 2, 1024, 65_536, 33_554_432])
        )
        rows.append((eid, t[u], u, "a", 1.0))
    got = {
        r[0]: (r[1], r[2])
        for r in _event_table(rows)
        .execute(ORACLES["events_interarrival_profile"])
        .fetchall()
    }
    gaps = []
    by_user: dict[int, list] = {}
    for eid, ts, u, _, _ in rows:
        by_user.setdefault(u, []).append((_ns(ts), eid))
    for evs in by_user.values():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gaps.append((b - a) // 1000)
    expect: dict[int, int] = {}
    for g in gaps:
        b = 0 if g == 0 else g.bit_length()
        expect[b] = expect.get(b, 0) + 1
    total = sum(expect.values())
    assert got == {
        b: (n, round(n / total, 6)) for b, n in expect.items()
    }, seed
