"""k-core decomposition invariants (test-only loop, the LPA contract):
core numbers are engine-internal, so correctness is pinned by structural
invariants plus an exact networkx-free Python reimplementation on the
collected sf0.001 edge list."""

from __future__ import annotations

from pyspark.sql import functions as F

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.operators.similarity import (
    _knn_graph_cached,
    knn_kcore_decomposition,
)
from tests.conftest import SF_SMALL


def _python_kcore(edges: set, max_k: int) -> dict:
    """Reference peel on an adjacency dict."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, t in edges:
        adj[s].add(t)
        adj[t].add(s)
    core = {n: 1 for n in adj}
    alive = dict(adj)
    for k in range(2, max_k + 1):
        alive = {n: set(nb) for n, nb in alive.items()}
        changed = True
        while changed:
            drop = [n for n, nb in alive.items() if len(nb) < k]
            changed = bool(drop)
            for n in drop:
                for m in alive.get(n, ()):  # prune back-references
                    alive.get(m, set()).discard(n)
                alive.pop(n, None)
        if not alive:
            break
        for n in alive:
            core[n] = k
    return core


def test_kcore_matches_python_peel(spark):
    got = {
        r["node"]: r["core"]
        for r in knn_kcore_decomposition(spark, SF_SMALL).collect()
    }
    knn = _knn_graph_cached(spark, SF_SMALL)
    edges = {
        (min(r["vec_id"], r["neighbor_id"]), max(r["vec_id"], r["neighbor_id"]))
        for r in knn.collect()
    }
    expect = _python_kcore(edges, 16)
    assert got == expect
    # structural floor: every node of the symmetrized kNN graph has
    # degree >= k (out-degree k), so the whole graph is at least k-core-ish
    assert max(got.values()) >= 2


def test_kcore_monotone_in_degree(spark):
    """A node's core number never exceeds its degree (peel invariant)."""
    knn = _knn_graph_cached(spark, SF_SMALL)
    fwd = knn.select(F.col("vec_id").alias("s"), F.col("neighbor_id").alias("t"))
    deg = (
        fwd.unionByName(fwd.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    joined = (
        knn_kcore_decomposition(spark, SF_SMALL)
        .join(deg.withColumnRenamed("s", "node"), "node")
        .collect()
    )
    assert joined and all(r["core"] <= r["d"] for r in joined)


def test_kcore_trace_zero_edge_survivor_round(spark, monkeypatch):
    """Planted bowtie: two degree-2 hubs whose leaves all die at k=2, so
    the round-1 keep set {A, B} survives with ZERO induced edges.  This
    exercises the deferred-edge-count flush's missing-degree-row default
    (``n_dir.get(k, 0)`` — no degree row exists the following round), a
    branch the shipped corpus never hits (every fixture keep set stays
    internally connected).  Expected trace from the synchronous-peel
    definition: k=2 peels 6->2 nodes with the round-1 edge count 0; k=3
    and k=4 empty immediately (round-0 row only)."""
    import paraslice_spark.operators.similarity as sim

    rows = []
    orderkey = 1
    for hub, leaves in ((100, (1, 2)), (101, (3, 4))):
        for leaf in leaves:
            for _ in range(2):  # >= _KCORE_MIN_SUPPORT co-orders per edge
                rows += [(orderkey, hub), (orderkey, leaf)]
                orderkey += 1
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    monkeypatch.setattr(sim, "load_tables", lambda s, d: {"lineitem": li})
    got = sorted(
        tuple(r)
        for r in sim.graph_copurchase_kcore_trace(spark, "planted").collect()
    )
    assert got == [
        (2, 0, 6, 4),
        (2, 1, 2, 0),
        (3, 0, 6, 4),
        (4, 0, 6, 4),
    ]
