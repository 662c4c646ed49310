"""From-scratch Python references for the round-9 declared queries
(SURVEY §5 layer 2): Tukey fences, the incremental-dedup append audit,
the shard manifest, the band-migration matrix, and the overdispersion
index are each recomputed with an independent naive algorithm (hashlib
as the md5 engine — independent of both Spark's and DuckDB's) at
sf0.001 and compared value-for-value."""

from __future__ import annotations

import hashlib

import duckdb

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_tukey_fences_matches_naive_quartiles(spark):
    vals = _fetch(
        f"SELECT event_type, CAST(round(value*1000000) AS BIGINT) "
        f"FROM '{SF_SMALL}/events.parquet'"
    )
    by_type: dict[str, list[int]] = {}
    for t, mv in vals:
        by_type.setdefault(t, []).append(mv)
    got = {
        r["event_type"]: r
        for r in QUERIES["events_tukey_fences"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(by_type)
    any_outlier = False
    for t, xs in by_type.items():
        xs.sort()
        n = len(xs)
        q1m = xs[(n + 3) // 4 - 1]  # nearest-rank ceil(n/4), 1-based
        q3m = xs[(3 * n + 3) // 4 - 1]
        iqr = q3m - q1m
        n_low = sum(1 for v in xs if 2 * v < 2 * q1m - 3 * iqr)
        n_high = sum(1 for v in xs if 2 * v > 2 * q3m + 3 * iqr)
        r = got[t]
        assert r["n"] == n
        assert round(r["q1_value"] * 1e6) == q1m
        assert round(r["q3_value"] * 1e6) == q3m
        assert (r["n_low_outliers"], r["n_high_outliers"]) == (n_low, n_high)
        any_outlier = any_outlier or n_low + n_high > 0
    assert any_outlier  # the gate is non-vacuous on the fixture


def _fp(text: str) -> str:
    toks = " ".join(sorted(set(text.split(" "))))
    return hashlib.md5(toks.encode()).hexdigest()


def test_incremental_audit_matches_two_run_dedup(spark):
    docs = _fetch(f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'")
    cutoff = max(d for d, _ in docs) * 4 // 5
    base = {(d, _fp(t)) for d, t in docs if d <= cutoff}
    inc = {(d, _fp(t)) for d, t in docs if d > cutoff}
    base_fps = {fp for _, fp in base}
    inc_fps = {fp for _, fp in inc}
    all_first: dict[str, int] = {}
    for d, fp in sorted(base | inc):
        all_first.setdefault(fp, d)
    expect = {
        "base": (
            len(base),
            len(base_fps),
            sum(1 for fp, d in all_first.items() if d <= cutoff),
        ),
        "increment": (
            len(inc),
            len(inc_fps),
            len(inc_fps - base_fps),
        ),
    }
    got = {
        r["segment"]: (r["n_docs"], r["n_kept_alone"], r["n_kept_combined"])
        for r in QUERIES["dedup_incremental_audit"](spark, SF_SMALL).collect()
    }
    assert got == expect
    # the declared structural contract: no base winner is ever displaced
    assert expect["base"][1] == expect["base"][2]
    # and the increment row is non-vacuous on the fixture
    assert expect["increment"][1] > expect["increment"][2]


def test_shard_manifest_matches_hashlib_recount(spark):
    docs = _fetch(f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'")
    man: dict[str, list] = {}
    for d, t in docs:
        b = hashlib.md5(str(d).encode()).hexdigest()[:1]
        m = man.setdefault(b, [0, 0, 0, None, None, 0])
        m[0] += 1
        m[1] += len(t.split(" "))
        m[2] += len(t)
        m[3] = d if m[3] is None else min(m[3], d)
        m[4] = d if m[4] is None else max(m[4], d)
        digest = hashlib.md5(t.encode()).hexdigest()
        m[5] += int(hashlib.md5(digest.encode()).hexdigest()[:8], 16)
    got = {
        r["bucket"]: (
            r["n_docs"], r["n_tokens"], r["n_chars"],
            r["id_lo"], r["id_hi"], r["content_sum"],
        )
        for r in QUERIES["pipeline_shard_manifest"](spark, SF_SMALL).collect()
    }
    assert got == {b: tuple(m) for b, m in man.items()}
    assert sum(m[0] for m in man.values()) == len(docs)


def test_band_migration_matrix_recount(spark):
    from paraslice_spark.operators.reshape import (
        _MIG_HIGH_C,
        _MIG_LOW_C,
        _MIG_SPLIT_DATE,
    )

    orders = _fetch(
        f"SELECT o_custkey, CAST(round(o_totalprice*100) AS BIGINT), "
        f"CASE WHEN o_orderdate < DATE '{_MIG_SPLIT_DATE}' THEN 0 ELSE 1 END "
        f"FROM '{SF_SMALL}/orders.parquet'"
    )
    custs = [r[0] for r in _fetch(
        f"SELECT c_custkey FROM '{SF_SMALL}/customer.parquet'"
    )]
    spend: dict[int, list[int]] = {c: [0, 0] for c in custs}
    for ck, cents, half in orders:
        spend[ck][half] += cents

    def band(c: int) -> str:
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
    got = {
        (r["band_h1"], r["band_h2"]): [
            r["n_customers"], round(r["revenue"] * 100)
        ]
        for r in QUERIES["customer_band_migration"](spark, SF_SMALL).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == len(custs)


def test_overdispersion_matches_python_series(spark):
    ts = [r[0] for r in _fetch(
        f"SELECT epoch_ns(ts) FROM '{SF_SMALL}/events.parquet'"
    )]
    mins = [t // 60_000_000_000 for t in ts]
    lo, hi = min(mins), max(mins)
    xs = [0] * (hi - lo + 1)
    for m in mins:
        xs[m - lo] += 1
    n, sk, sk2 = len(xs), sum(xs), sum(x * x for x in xs)
    d = (n * sk2 - sk * sk) / ((n - 1) * sk)
    [r] = QUERIES["events_overdispersion"](spark, SF_SMALL).collect()
    assert (r["n_minutes"], r["n_events"], r["sum_sq"]) == (n, sk, sk2)
    assert r["dispersion"] == round(d, 6)
