"""Fixture-independent fuzz of the round-10 ORACLES on seeded random
tables (the test_r9_oracle_fuzz discipline): each registered DuckDB
oracle is re-derived from scratch in pure Python on random inputs, so
the SQL formulas survive a future testdata regeneration.

Embedding components are generated as integer micros / 1e6 so the
micro-unit quantization is representation-exact (the r9b money-cents
discipline applied to vectors) and base/increment segments draw from
SHIFTED distributions so the retrain-drift signal is exercised, not
just the near-zero-drift regime the fixture provides."""

from __future__ import annotations

import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES
from tests.test_r10_features import qa_python


@pytest.mark.parametrize("seed", range(6))
def test_quantizer_append_audit_oracle_on_random_tables(seed):
    rng = random.Random(10_000 + seed)
    n = rng.randrange(30, 300)
    dim = rng.choice((8, 12, 64))
    # per-dim base mean + a per-dim increment shift (exercises moved bits)
    mu = [rng.randrange(-400_000, 400_000) for _ in range(dim)]
    dshift = [rng.randrange(-300_000, 300_000) for _ in range(dim)]
    cutoff_domain = rng.randrange(2, 40)  # sparse/dense id regimes
    vecs = []
    vid = 0
    for _ in range(n):
        vid += rng.randrange(1, cutoff_domain)
        is_inc = False  # decided by the engines' own cutoff rule below
        vecs.append((vid, None, is_inc))
    max_id = vecs[-1][0]
    cut = max_id * 4 // 5
    final = []
    for vid, _, _ in vecs:
        shift = dshift if vid > cut else [0] * dim
        emb = [
            (mu[d] + shift[d] + rng.randrange(-500_000, 500_000)) / 1e6
            for d in range(dim)
        ]
        final.append((vid, emb))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", final)
    got = con.execute(
        ORACLES["similarity_quantizer_append_audit"]
    ).fetchall()
    assert got == [qa_python(final)], seed


_EPOCH = __import__("datetime").datetime(1970, 1, 1)


@pytest.mark.parametrize("seed", range(6))
def test_session_watermark_audit_oracle_on_random_tables(seed):
    """Boundary menu: 0-step ts ties, EXACTLY the 12-h gap (same episode
    under the strict-> rule), gap+1s (new episode), and cross-user ts
    collisions — arrival ties broken by event_id in both derivations."""
    import datetime

    from tests.test_r10_features import session_wm_python

    rng = random.Random(11_000 + seed)
    base = datetime.datetime(2024, 3, 1)
    t = {u: base for u in range(1, 7)}
    rows = []
    for eid in range(1, rng.randrange(40, 300)):
        u = rng.randrange(1, 7)
        step = rng.choice(
            [0, 1, 3600, 43_199, 43_200, 43_201, 90_000, 200_000]
        )
        t[u] = t[u] + datetime.timedelta(seconds=step)
        rows.append((eid, t[u], u))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    got = con.execute(ORACLES["events_session_watermark_audit"]).fetchall()
    py = session_wm_python(
        [
            (
                eid,
                u,
                int((ts - _EPOCH) // datetime.timedelta(microseconds=1))
                * 1000,
            )
            for eid, ts, u in rows
        ]
    )
    assert got == [py], seed


@pytest.mark.parametrize("seed", range(6))
def test_join_cardinality_audit_oracle_on_random_tables(seed):
    """Skewed key draws (Pareto-ish repeat counts) exercise the regime
    the audit exists for; tiny domains exercise the LEAST(9, ...) cap
    and near-exact histogram branch."""
    from tests.test_r10_features import join_card_python

    rng = random.Random(14_500 + seed)
    n_li = rng.randrange(60, 500)
    li = [
        (
            rng.randrange(1, 30),  # orderkey (unused by the audit)
            min(int(rng.paretovariate(1.0)), 40),  # skewed partkey
            rng.randrange(1, rng.choice([4, 12, 60])),  # suppkey domains
            rng.randrange(1, 20),
            rng.randrange(100, 90_000) / 100.0,
            rng.choice([0, 1, 5]) / 100.0,
        )
        for _ in range(n_li)
    ]
    od = [(rng.randrange(1, 40),) for _ in range(rng.randrange(30, 300))]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT,"
        " l_suppkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
        " l_discount DOUBLE)"
    )
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?, ?, ?, ?)", li)
    con.execute("CREATE TABLE orders(o_custkey BIGINT)")
    con.executemany("INSERT INTO orders VALUES (?)", od)
    got = con.execute(ORACLES["stats_join_cardinality_audit"]).fetchall()
    want = join_card_python(
        {
            "l_partkey": [r[1] for r in li],
            "l_suppkey": [r[2] for r in li],
        },
        [r[0] for r in od],
    )
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_release_diff_oracle_on_random_tables(seed):
    """Sparse/dense id regimes swing the class mix (all-changed at one
    extreme, mostly-new at the other); duplicate texts across the
    cutoff exercise checksum-sum (not set) semantics."""
    from tests.test_r10_features import release_diff_python

    rng = random.Random(15_000 + seed)
    docs, did = [], 0
    for _ in range(rng.randrange(30, 400)):
        did += rng.randrange(1, rng.choice([2, 9, 40]))
        docs.append((did, rng.choice(["aa bb", "cc", "dd ee ff", "gg"])))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = sorted(con.execute(ORACLES["pipeline_release_diff"]).fetchall())
    assert got == release_diff_python(docs), seed


@pytest.mark.parametrize("seed", range(6))
def test_survivorship_bias_oracle_on_random_tables(seed):
    """Duplicate fingerprints planted ACROSS length bands (same distinct
    word set, different repetition) exercise the cross-band counter;
    constant-length corpora exercise the mx = mn degenerate bound."""
    from tests.test_r10_features import survivorship_python

    rng = random.Random(16_000 + seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    const_len = seed % 3 == 0
    docs = []
    for did in range(1, rng.randrange(30, 250)):
        base = rng.sample(vocab, rng.randrange(1, 5))
        if const_len:
            words = (base * 8)[:8]
        else:
            words = base * rng.randrange(1, 9)  # repetition varies length
        rng.shuffle(words)
        docs.append((did, " ".join(words)))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = sorted(con.execute(ORACLES["dedup_survivorship_bias"]).fetchall())
    assert got == survivorship_python(docs), seed


@pytest.mark.parametrize("seed", range(6))
def test_kmv_intersection_oracle_on_random_tables(seed):
    """Overlap regimes the fixture can't reach: disjoint audiences
    (exact = 0 with a nonzero estimate floor of 0), near-total overlap,
    and sub-k populations (the exact-fallback branch)."""
    from tests.test_r10_features import (
        _PRIORITIES,
        kmv_intersection_python,
    )

    rng = random.Random(17_000 + seed)
    sparse = seed % 3 == 0  # sub-k fallback regime
    dom = 40 if sparse else 400
    rows = []
    for ok in range(1, rng.randrange(60, 600)):
        t = rng.choice(_PRIORITIES)
        # segment-shifted customer domains create partial/disjoint overlap
        base = _PRIORITIES.index(t) * (dom // 3)
        rows.append((ok, t, base + rng.randrange(1, dom)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_orderkey BIGINT, o_orderpriority VARCHAR,"
        " o_custkey BIGINT)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", rows)
    got = sorted(
        con.execute(ORACLES["agg_kmv_intersection_error"]).fetchall()
    )
    assert got == kmv_intersection_python(
        [(t, c) for _ok, t, c in rows]
    ), seed
