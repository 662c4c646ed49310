"""Randomized validation of the emit-on-strict-shrink recursive-CTE peel
(the graph_copurchase_kcore_trace oracle pattern): on seeded random
graphs spanning empty cores, full-graph fixpoints, and multi-round
cascades, the CTE's round trace must equal a from-scratch Python
synchronous peel.  Pure DuckDB — validates the SQL pattern itself,
independent of the fixture tables."""

from __future__ import annotations

import collections
import random

import duckdb
import pytest

from paraslice_spark.operators.similarity import _kcore_recursive_cte


def _python_trace(und, k):
    nodes = {s for s, _ in und}
    out, r = [], 0
    while nodes:
        ecur = [(s, t) for s, t in und if s in nodes and t in nodes]
        out.append((r, len(nodes), len(ecur) // 2))
        deg = collections.Counter(s for s, _ in ecur)
        surv = {s for s in nodes if deg[s] >= k}
        if not surv or surv == nodes:
            break
        nodes = surv
        r += 1
    return out


def _duckdb_trace(und, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE kedges(s BIGINT, t BIGINT)")
    con.executemany("INSERT INTO kedges VALUES (?, ?)", und)
    sql = f"""
    WITH RECURSIVE {_kcore_recursive_cte(k).replace(f'alive{k}', 'alive')},
    al AS (SELECT r, COUNT(*) AS n_alive FROM alive GROUP BY 1),
    ec AS (SELECT a1.r, COUNT(*) AS n_dir
           FROM alive a1 JOIN kedges e ON e.s = a1.node
           JOIN alive a2 ON a2.r = a1.r AND a2.node = e.t
           GROUP BY 1)
    SELECT al.r, al.n_alive, COALESCE(ec.n_dir, 0) // 2
    FROM al LEFT JOIN ec USING (r) ORDER BY al.r
    """
    return [tuple(map(int, row)) for row in con.execute(sql).fetchall()]


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("k", [2, 3, 4])
def test_recursive_peel_matches_python_on_random_graphs(seed, k):
    rng = random.Random(1000 * k + seed)
    n = rng.randrange(8, 40)
    m = rng.randrange(n // 2, 3 * n)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    und = sorted(edges | {(b, a) for a, b in edges})
    if not und:
        pytest.skip("degenerate empty graph")
    assert _duckdb_trace(und, k) == _python_trace(und, k)


def test_recursive_peel_path_plus_clique_multiround():
    """The adversarial shape: a long path peels ONE layer per round (many
    recursion iterations) before the clique fixpoint is reached."""
    path = [(i, i + 1) for i in range(12)]
    clique = [(20, 21), (21, 22), (20, 22), (12, 20)]
    base = path + clique
    und = sorted(set(base) | {(b, a) for a, b in base})
    got = _duckdb_trace(und, 2)
    assert got == _python_trace(und, 2)
    assert len(got) >= 6  # genuinely multi-round
    assert got[-1][1] == 3  # the triangle survives


def test_recursive_peel_zero_edge_survivor_round():
    """Planted bowtie (engine twin in test_graph_kcore): the k=2 keep set
    {100, 101} survives round 1 with zero induced edges — the recursive
    term must still emit the shrink row with COALESCE'd 0 edges and then
    terminate (empty degree table ends the recursion)."""
    base = [(100, 1), (100, 2), (101, 3), (101, 4)]
    und = sorted(set(base) | {(b, a) for a, b in base})
    got = _duckdb_trace(und, 2)
    assert got == _python_trace(und, 2)
    assert got == [(0, 6, 4), (1, 2, 0)]
