"""From-scratch Python references for the round-9 late additions
(SURVEY §5 layer 2): the shuffle-skew audit, the customer Pareto
skyline, and the Theil–Sen trend are each recomputed with an
independent naive algorithm (hashlib as the md5 engine, brute-force
O(n²) dominance, a full numpy pair sweep) at sf0.001 and compared
value-for-value — the overdispersion lesson: an oracle hash-match
does not validate the formula, only a third derivation does."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _md5_u32(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def test_shuffle_skew_audit_matches_hashlib_rebuild(spark):
    rows = _fetch(
        f"""
        SELECT 'l_quantity' AS col, CAST(round(l_quantity*100) AS BIGINT) AS v
        FROM '{SF_SMALL}/lineitem.parquet'
        UNION ALL SELECT 'l_extendedprice',
                         CAST(round(l_extendedprice*100) AS BIGINT)
        FROM '{SF_SMALL}/lineitem.parquet'
        UNION ALL SELECT 'l_discount', CAST(round(l_discount*100) AS BIGINT)
        FROM '{SF_SMALL}/lineitem.parquet'
        UNION ALL SELECT 'l_partkey', l_partkey
        FROM '{SF_SMALL}/lineitem.parquet'
        UNION ALL SELECT 'l_suppkey', l_suppkey
        FROM '{SF_SMALL}/lineitem.parquet'
        UNION ALL SELECT 'o_custkey', o_custkey
        FROM '{SF_SMALL}/orders.parquet'
        """
    )
    counts: dict[str, dict[int, int]] = {}
    for col, v in rows:
        cv = counts.setdefault(col, {})
        cv[v] = cv.get(v, 0) + 1
    got = {
        r["col"]: r
        for r in QUERIES["stats_shuffle_skew_audit"](spark, SF_SMALL).collect()
    }
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
        r = got[col]
        assert r["n"] == n and r["ndv"] == len(cv)
        assert r["top_share_ppm"] == top * 1_000_000 // n
        assert r["buckets_used"] == len(buckets)
        assert r["max_bucket"] == sizes[-1]
        assert r["med_bucket"] == med
        assert r["skew_x1000"] == sizes[-1] * 1000 // med
    # non-vacuous: at least one audited key actually shows skew
    assert any(r["skew_x1000"] > 1500 for r in got.values())


def test_pareto_skyline_matches_bruteforce_dominance(spark):
    rows = _fetch(
        f"""
        SELECT c.c_mktsegment, o.o_custkey,
               SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS spend_c,
               MAX(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01')
                 AS last_day,
               COUNT(*) AS n_orders
        FROM '{SF_SMALL}/orders.parquet' o
        JOIN '{SF_SMALL}/customer.parquet' c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
        """
    )
    by_seg: dict[str, list[tuple]] = {}
    for seg, ck, sp, ld, no in rows:
        by_seg.setdefault(seg, []).append((ck, int(sp), int(ld), int(no)))
    expect = set()
    for seg, cs in by_seg.items():
        for ck, sp, ld, no in cs:
            dominated = any(
                (sp2 >= sp and ld2 >= ld and (sp2 > sp or ld2 > ld))
                for _, sp2, ld2, _ in cs
            )
            if not dominated:
                expect.add((seg, ck, sp, ld, no))
    got = {
        (
            r["c_mktsegment"],
            r["c_custkey"],
            round(r["spend"] * 100),
            r["last_day"],
            r["n_orders"],
        )
        for r in QUERIES["customer_pareto_skyline"](spark, SF_SMALL).collect()
    }
    assert got == expect
    # non-vacuous and non-trivial: a real front, smaller than the table
    assert 5 <= len(expect) < len(rows)


def test_theil_sen_matches_numpy_pair_sweep(spark):
    rows = _fetch(
        f"SELECT epoch_ns(ts) // 3600000000000 AS h, COUNT(*) "
        f"FROM '{SF_SMALL}/events.parquet' GROUP BY 1"
    )
    cv = dict(rows)
    lo, hi = min(cv), max(cv)
    x = np.array([cv.get(h, 0) for h in range(lo, hi + 1)], dtype=np.int64)
    n = len(x)
    i = np.arange(n, dtype=np.int64)
    ii, jj = np.triu_indices(n, k=1)
    slopes = (x[jj] - x[ii]).astype(float) / (jj - ii).astype(float)
    slopes.sort()
    npairs = len(slopes)
    sen = slopes[(npairs + 1) // 2 - 1]
    sx, sxx = int(i.sum()), int((i * i).sum())
    sy, sxy = int(x.sum()), int((i * x).sum())
    ols = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    r = QUERIES["events_theil_sen_trend"](spark, SF_SMALL).collect()[0]
    assert r["n_hours"] == n and r["n_pairs"] == npairs
    assert r["sen_slope"] == round(sen, 6)
    assert r["ols_slope"] == round(ols, 6)
