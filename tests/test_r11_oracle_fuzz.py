"""Fixture-independent fuzz of the round-11 ORACLES on seeded random
tables (the test_r10_oracle_fuzz discipline): each new DuckDB oracle is
re-derived from scratch in pure Python on random inputs, so the SQL
formulas survive a future testdata regeneration.

Edge menus per query: retention gets single-day users, duplicate
(user, day) events, offsets past the 0..7 window and a degenerate
all-users-equal-activity corpus (mn == mx); split stability gets sparse
ids, sub-8-row corpora and an empty-base corner (min id above the
cutoff); shard balance gets rare languages and missing (shard, lang)
cells; the sample sweep gets zero-sample rates (the GREATEST guard
path) and prices at the .005 rounding boundary."""

from __future__ import annotations

import datetime
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES
from tests.test_r11_features import (
    retention_survivorship_python,
    sample_error_python,
    shard_balance_python,
    split_stability_python,
)


@pytest.mark.parametrize("seed", range(6))
def test_retention_survivorship_oracle_on_random_tables(seed):
    rng = random.Random(20_000 + seed)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    degenerate = seed == 3  # every user equally active: mn == mx
    for u in range(1, rng.randrange(3, 12)):
        start = rng.randrange(0, 4)
        days = (
            range(start, start + 5)
            if degenerate
            else sorted(
                rng.sample(
                    range(start, start + 13),
                    rng.randrange(1, 12),
                )
            )
        )
        for d in days:
            for _ in range(rng.randrange(1, 3)):  # same-day dupes
                rows.append(
                    (
                        u,
                        base
                        + datetime.timedelta(
                            days=d, seconds=rng.randrange(0, 86_400)
                        ),
                    )
                )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(ORACLES["events_retention_survivorship"]).fetchall()
    assert got == retention_survivorship_python(rows), seed


@pytest.mark.parametrize("seed", range(6))
def test_split_stability_oracle_on_random_tables(seed):
    rng = random.Random(21_000 + seed)
    if seed == 4:  # empty-base corner: single id above its own cutoff
        ids = [rng.randrange(1, 50)]
    else:
        n = rng.randrange(2, 400)
        step = rng.randrange(1, 30)
        ids, cur = [], 0
        for _ in range(n):
            cur += rng.randrange(1, step + 1)
            ids.append(cur)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)", [(i,) for i in ids])
    got = con.execute(ORACLES["sample_split_stability_audit"]).fetchall()
    assert got == split_stability_python(ids), seed


@pytest.mark.parametrize("seed", range(6))
def test_shard_balance_oracle_on_random_tables(seed):
    rng = random.Random(22_000 + seed)
    langs = ["aa", "bb", "cc", "dd", "rare"][: rng.randrange(2, 6)]
    weights = [rng.randrange(1, 20) for _ in langs]
    if "rare" in langs:
        weights[-1] = 1
    rows = []
    for doc_id in range(1, rng.randrange(20, 400)):
        rows.append((doc_id, rng.choices(langs, weights)[0]))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = con.execute(ORACLES["pipeline_shard_balance_audit"]).fetchall()
    assert got == shard_balance_python(rows), seed


@pytest.mark.parametrize("seed", range(6))
def test_sample_error_sweep_oracle_on_random_tables(seed):
    rng = random.Random(23_000 + seed)
    n = rng.randrange(3, 600)  # tiny n -> some rates sample zero rows
    keys = rng.sample(range(1, 1_000_000), n)
    rows = []
    for k in keys:
        cents = rng.randrange(1, 50_000_000)
        if rng.random() < 0.2:
            cents = cents - cents % 10 + 5  # land on a .005 price boundary
        rows.append((k, cents / 100.0))
    con = duckdb.connect()
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_totalprice DOUBLE)")
    con.executemany("INSERT INTO orders VALUES (?, ?)", rows)
    got = con.execute(ORACLES["stats_sample_error_sweep"]).fetchall()
    assert got == sample_error_python(rows), seed


@pytest.mark.parametrize("seed", range(6))
def test_pack_waste_sweep_oracle_on_random_tables(seed):
    """Token counts up to 6000 plant docs LONGER than every candidate
    ctx, so multi-boundary crossings diverge from split-doc counts (the
    fixture can't exercise that — its docs are <= 99 tokens); doc text
    is synthesized with exactly the drawn whitespace token count."""
    from tests.test_r11_features import pack_waste_python

    rng = random.Random(24_000 + seed)
    docs = []
    for doc_id in range(1, rng.randrange(10, 200)):
        tok = rng.choice(
            [rng.randrange(1, 120), rng.randrange(200, 6000)]
        )
        docs.append((doc_id, tok))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, " ".join(["x"] * t)) for i, t in docs],
    )
    got = con.execute(ORACLES["pipeline_pack_waste_sweep"]).fetchall()
    want = pack_waste_python(docs)
    assert got == want, seed
    # the divergence the fixture can't show: some doc crosses >1 boundary
    assert any(r[5] > r[4] for r in want), seed
