"""From-scratch Python references for the exact rank-statistic queries
(SURVEY §5 layer 2): Mann-Whitney U, the two-sample KS distance, the
k-core peel trace, and keep-best representative selection are each
recomputed with an independent naive algorithm at sf0.001 and compared
value-for-value — the same exact-reference discipline as
tests/test_graph_kcore.py."""

from __future__ import annotations

import collections
import math

import duckdb

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_mannwhitney_matches_naive_ranking(spark):
    con = duckdb.connect()
    vals = con.execute(
        f"SELECT CAST(ROUND(l_quantity) AS BIGINT), l_returnflag "
        f"FROM '{SF_SMALL}/lineitem.parquet' WHERE l_returnflag IN ('R','N')"
    ).fetchall()
    pooled = sorted(vals)
    # naive average ranks (1-based), per-item
    ranks: dict[int, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        ranks[pooled[i][0]] = avg
        i = j
    r1 = sum(ranks[v] for v, g in vals if g == "R")
    n1 = sum(1 for _, g in vals if g == "R")
    n2 = len(vals) - n1
    two_u1 = round(2 * r1) - n1 * (n1 + 1)
    tie = collections.Counter(v for v, _ in vals)
    tie_term = sum(t**3 - t for t in tie.values())
    row = QUERIES["lineitem_mannwhitney_u"](spark, SF_SMALL).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["two_u1"] == two_u1
    assert row["tie_term"] == tie_term
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1.0)))
    z = (two_u1 / 2.0 - n1 * n2 / 2.0) / math.sqrt(var)
    assert abs(row["z"] - z) < 2e-6
    assert abs(row["cles"] - two_u1 / 2.0 / (n1 * n2)) < 2e-6


def test_ks_matches_naive_ecdf(spark):
    con = duckdb.connect()
    vals = con.execute(
        f"SELECT CAST(ROUND(o_totalprice*100) AS BIGINT), o_orderpriority "
        f"FROM '{SF_SMALL}/orders.parquet' "
        f"WHERE o_orderpriority IN ('1-URGENT','5-LOW')"
    ).fetchall()
    a = sorted(v for v, g in vals if g == "1-URGENT")
    b = sorted(v for v, g in vals if g == "5-LOW")
    n1, n2 = len(a), len(b)
    best, best_v = -1, None
    import bisect

    for v in sorted({*a, *b}):
        r1 = bisect.bisect_right(a, v)
        r2 = bisect.bisect_right(b, v)
        d = abs(r1 * n2 - r2 * n1)
        if d > best:
            best, best_v = d, v
    row = QUERIES["orders_ks_price_shift"](spark, SF_SMALL).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_num"] == best
    assert row["ks_at_cents"] == best_v
    assert abs(row["ks_d"] - best / (n1 * n2)) < 2e-6


def _copurchase_edges(sf_dir: str) -> list[tuple[int, int]]:
    con = duckdb.connect()
    return con.execute(
        f"""
        WITH o AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{sf_dir}/lineitem.parquet'),
        p AS (SELECT a.l_partkey s, b.l_partkey t
              FROM o a JOIN o b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT s, t FROM p UNION ALL SELECT t, s FROM p
        """
    ).fetchall()


def test_kcore_trace_matches_naive_peel(spark):
    und = _copurchase_edges(SF_SMALL)
    expected = []
    for k in (2, 3, 4):
        nodes = {s for s, _ in und}
        r = 0
        while True:
            ecur = [(s, t) for s, t in und if s in nodes and t in nodes]
            expected.append((k, r, len(nodes), len(ecur) // 2))
            deg = collections.Counter(s for s, _ in ecur)
            surv = {s for s in nodes if deg[s] >= k}
            if not surv or surv == nodes:
                break
            nodes = surv
            r += 1
    got = sorted(
        tuple(rw)
        for rw in QUERIES["graph_copurchase_kcore_trace"](
            spark, SF_SMALL
        ).collect()
    )
    assert got == sorted(expected)


def test_keep_best_consistent_with_groups(spark):
    groups = {
        rw["doc_id"]: (rw["rep_id"], rw["group_size"])
        for rw in QUERIES["dedup_groups"](spark, SF_SMALL).collect()
    }
    words = {
        rw["doc_id"]: rw["w"]
        for rw in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .selectExpr("doc_id", "size(split(text, ' ')) AS w")
        .collect()
    }
    kept = QUERIES["dedup_keep_best"](spark, SF_SMALL).collect()
    multi = {rep for _, (rep, gs) in groups.items() if gs >= 2}
    assert {rw["rep_id"] for rw in kept} == multi
    by_rep = collections.defaultdict(list)
    for doc, (rep, gs) in groups.items():
        if gs >= 2:
            by_rep[rep].append(doc)
    for rw in kept:
        members = by_rep[rw["rep_id"]]
        assert rw["n_docs"] == len(members)
        assert rw["n_dropped"] == len(members) - 1
        best = min(members, key=lambda d: (-words[d], d))
        assert rw["keep_doc_id"] == best
        assert rw["keep_words"] == words[best]
        assert rw["words_dropped"] == sum(
            words[d] for d in members if d != best
        )


def test_rank2_map_matches_naive_on_random_multisets(spark):
    """_rank2_map (shared by Spearman and structurally by Mann-Whitney)
    must reproduce 2·(1-based average pooled rank) for every distinct
    value of an arbitrary multiset, at several bucket widths including
    degenerate ones (everything in one bucket / one value per bucket)."""
    import random

    from paraslice_spark.operators.aggregates import _rank2_map

    rng = random.Random(20260815)
    vals = [rng.randrange(0, 40) for _ in range(500)] + [7] * 30 + [39] * 11
    pooled = sorted(vals)
    naive: dict[int, int] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        naive[pooled[i]] = (i + 1) + j  # 2·avg of ranks i+1..j
        i = j
    import pandas as pd

    hist = pd.Series(vals).value_counts().rename_axis("v").reset_index(name="t")
    byv = spark.createDataFrame(hist[["v", "t"]].astype("int64"))
    for width in (1, 4, 1000):
        got = {
            rw["v"]: rw["r2"]
            for rw in _rank2_map(byv, width).collect()
        }
        assert got == naive, f"width={width}"


def test_haar_energy_satisfies_exact_parseval(spark):
    """Unnormalized Haar obeys the EXACT integer Parseval identity
    2^10 · Σx² = Σ_l E_l · 2^(10−l) + DC² — a full-transform consistency
    check no single-level bug can survive."""
    import duckdb

    rows = {r["level"]: r for r in
            QUERIES["events_haar_energy"](spark, SF_SMALL).collect()}
    con = duckdb.connect()
    sum_sq = con.execute(
        f"""SELECT SUM(x * x) FROM (
              SELECT COUNT(*) AS x FROM '{SF_SMALL}/events.parquet'
              GROUP BY epoch_ns(ts) // 3600000000000)"""
    ).fetchone()[0]
    lhs = (2**10) * int(sum_sq)
    rhs = rows[0]["energy"] + sum(
        rows[lvl]["energy"] * 2 ** (10 - lvl) for lvl in range(1, 11)
    )
    assert lhs == rhs
    assert rows[0]["energy"] > 0 and any(
        rows[lvl]["energy"] > 0 for lvl in range(1, 11)
    )
