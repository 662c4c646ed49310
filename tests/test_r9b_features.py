"""From-scratch Python references for the round-9 late additions
(SURVEY §5 layer 2): the shuffle-skew audit, the customer Pareto
skyline, and the Theil–Sen trend are each recomputed with an
independent naive algorithm (hashlib as the md5 engine, brute-force
O(n²) dominance, a full numpy pair sweep) at sf0.001 and compared
value-for-value — the overdispersion lesson: an oracle hash-match
does not validate the formula, only a third derivation does."""

from __future__ import annotations

import hashlib
import math

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


def _rnd6(x: float) -> float:
    """Half-AWAY-from-zero at 6 places — both engines' ROUND on doubles.
    Python's round() is banker's and differs on exactly-dyadic ratios
    (the CLAUDE.md 85/128 case) — ADVICE r9 flagged the round() uses here
    as a latent regenerated-corpus flake."""
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


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
    assert r["sen_slope"] == _rnd6(sen)
    assert r["ols_slope"] == _rnd6(ols)


def test_attribution_matches_python_replay(spark):
    rows = _fetch(
        f"SELECT event_id, epoch_ns(ts), user_id, event_type, "
        f"CAST(round(value*1000000) AS BIGINT) "
        f"FROM '{SF_SMALL}/events.parquet' "
        f"WHERE event_type IN ('view','click','purchase')"
    )
    by_user: dict[int, list] = {}
    for eid, t, u, ty, mv in rows:
        by_user.setdefault(u, []).append((t, eid, ty, mv))
    acc: dict[str, list] = {}
    for evs in by_user.values():
        evs.sort()
        last = None
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
    got = {
        r["touch_type"]: r
        for r in QUERIES["events_attribution_last_touch"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(acc)
    for k, (n, mv, lat, nlat) in acc.items():
        assert got[k]["n_purchases"] == n
        assert got[k]["total_value"] == mv / 1e6
        assert got[k]["mean_latency_s"] == (
            _rnd6(lat / nlat) if nlat else None
        )
    # non-vacuous: both attributed channels and the none bucket exist
    assert {"view", "click"} <= set(acc)


def test_assortativity_matches_numpy_rebuild(spark):
    """The kNN edge builder is already hash-validated through
    similarity_knn_graph's own oracle; what needs a third derivation
    here is the ASSORTATIVITY STATISTIC — recomputed as a plain
    np.corrcoef over the directed stub degree pairs (scale-invariant,
    so the sample/population split cancels) from the same edges."""
    from tests.oracle_harness import duck_con
    from paraslice_spark.registry import ORACLES

    with duck_con(SF_SMALL) as con:
        knn = con.sql(ORACLES["similarity_knn_graph"]).fetchall()
    edges = {
        (min(a, b), max(a, b)) for a, b, _ in knn
    }
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    r_ref = float(np.corrcoef(xs, ys)[0, 1])
    row = QUERIES["graph_degree_assortativity"](spark, SF_SMALL).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - r_ref) < 1e-6


def test_novelty_curve_matches_python_and_declines(spark):
    docs = dict(
        _fetch(f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'")
    )
    mn, mx = min(docs), max(docs)
    first: dict[str, int] = {}
    for d in sorted(docs):
        for w in set(docs[d].split(" ")):
            first.setdefault(w, d)
    agg: dict[int, list] = {}
    for d, text in docs.items():
        b = (d - mn) * 10 // (mx - mn + 1)
        a = agg.setdefault(b, [0, 0, 0])
        ws = set(text.split(" "))
        a[0] += 1
        a[1] += len(ws)
        a[2] += sum(1 for w in ws if first[w] == d)
    got = {
        r["bucket"]: r
        for r in QUERIES["text_novelty_curve"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(agg)
    for b, (nd, ng, nn) in agg.items():
        r = got[b]
        assert (r["n_docs"], r["n_grams"], r["n_new"]) == (nd, ng, nn)
        assert r["novelty_ppm"] == nn * 1_000_000 // ng
    # vocabulary saturates: the first decile is the most novel
    ppm = [got[b]["novelty_ppm"] for b in sorted(got)]
    assert ppm[0] == max(ppm) and ppm[0] > ppm[-1]


def test_tensor_mode_skew_matches_python_rebuild(spark):
    rows = _fetch(
        f"SELECT user_id, event_type, "
        f"epoch_ns(ts) // 3600000000000, "
        f"CAST(round(value*1000000) AS BIGINT) "
        f"FROM '{SF_SMALL}/events.parquet'"
    )
    cells: dict[tuple, int] = {}
    for u, t, h, vm in rows:
        k = (u, t, h)
        cells[k] = cells.get(k, 0) + vm
    nz = [k for k, vm in cells.items() if vm != 0]
    got = {
        r["mode"]: r
        for r in QUERIES["tensor_mode_skew_profile"](spark, SF_SMALL).collect()
    }
    for mode, pos in (("i", 0), ("j", 1), ("k", 2)):
        per: dict = {}
        for k in nz:
            per[k[pos]] = per.get(k[pos], 0) + 1
        sizes = sorted(per.values())
        med = sizes[(len(sizes) + 1) // 2 - 1]
        r = got[mode]
        assert r["n_slices"] == len(per)
        assert r["total_nnz"] == len(nz)
        assert (r["min_nnz"], r["max_nnz"], r["med_nnz"]) == (
            sizes[0],
            sizes[-1],
            med,
        )
        assert r["top_slice_ppm"] == sizes[-1] * 1_000_000 // len(nz)


def test_tensor_gram_matches_python_rebuild(spark):
    rows = _fetch(
        f"SELECT user_id, event_type, "
        f"epoch_ns(ts) // 3600000000000, "
        f"CAST(round(value*100) AS BIGINT) "
        f"FROM '{SF_SMALL}/events.parquet'"
    )
    cells: dict[tuple, int] = {}
    for u, t, h, cm in rows:
        k = (u, h)
        cells.setdefault(k, {})
        cells[k][t] = cells[k].get(t, 0) + cm
    gram: dict[tuple, list] = {}
    for per_t in cells.values():
        per_t = {t: cm for t, cm in per_t.items() if cm != 0}
        for ta, ca in per_t.items():
            for tb, cb in per_t.items():
                g = gram.setdefault((ta, tb), [0, 0])
                g[0] += 1
                g[1] += ca * cb
    got = {
        (r["type_a"], r["type_b"]): (r["n_pairs"], r["gram_c2"])
        for r in QUERIES["tensor_unfold_gram_type"](spark, SF_SMALL).collect()
    }
    assert got == {k: tuple(v) for k, v in gram.items()}
    # symmetry + diagonal dominance (Gram sanity)
    for (ta, tb), (_, g) in got.items():
        assert got[(tb, ta)][1] == g
        if ta != tb:
            assert g * g <= got[(ta, ta)][1] * got[(tb, tb)][1]


def test_eqdepth_histogram_matches_python_rebuild(spark):
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
        """
    )
    counts: dict[str, dict[int, int]] = {}
    for col, v in rows:
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
    got = {
        (r["col"], r["bucket"]): [r["n"], r["ndv"], r["v_lo"], r["v_hi"]]
        for r in QUERIES["stats_eqdepth_histogram_lineitem"](
            spark, SF_SMALL
        ).collect()
    }
    assert got == expect
    # equi-depth sanity: for a high-NDV column the bucket masses are
    # within one value's weight of n/10, and l_discount's heavy hitters
    # produce visibly unequal buckets (the skew signal)
    hi = {b: m[0] for (c, b), m in got.items() if c == "l_extendedprice"}
    n = sum(hi.values())
    assert len(hi) == 10 and max(hi.values()) - min(hi.values()) <= n // 10
