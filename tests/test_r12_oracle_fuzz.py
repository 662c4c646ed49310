"""Round-12 oracle fuzz: from-scratch third-engine rederivations of the
oracles added/changed this round, on RANDOM tables (the house bar — an
oracle must be right because its math is right, not because it happens to
match the fixture).

LPA: the graph_lpa_communities oracle (3 unrolled mode-label rounds over
the _KNN_ORACLE edge spec) is rederived in pure Python on dyadic-rational
vectors — exact float64 dots (no summation-order hazard), rounded-cosine
ranking with neighbor_id ties, symmetrized-distinct edges, the
count-DESC/label-ASC mode tie-break, and the size-of-sizes histogram.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


def _rnd(x: float, n: int) -> float:
    # ROUND half-away-from-zero, matching Spark/DuckDB (CLAUDE.md trap:
    # Python round() is banker's and diverges on exactly-dyadic ratios)
    p = 10**n
    return math.floor(abs(x) * p + 0.5) / p * (1 if x >= 0 else -1)


@pytest.mark.parametrize("seed", range(6))
def test_lpa_communities_oracle_on_random_tables(seed):
    """graph_lpa_communities (hash-oracled r12, VERDICT r11 #3): kNN
    edges + 3 synchronous mode-label rounds + community-size histogram,
    all rederived from scratch."""
    rng = random.Random(15_000 + seed)
    dim = 8
    vecs = []
    for vid in range(rng.randrange(15, 45)):
        k = [rng.randrange(-64, 65) for _ in range(dim)]
        if not any(k):
            k[0] = 1  # no zero vectors (cosine undefined)
        vecs.append((vid, k))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(vid, [x / 64.0 for x in k]) for vid, k in vecs],
    )
    got = con.execute(ORACLES["graph_lpa_communities"]).fetchall()

    # exact dyadic kNN (the _KNN_ORACLE spec): rounded cosine DESC,
    # neighbor_id ASC, top 3 per vector
    norm2 = {vid: sum(x * x for x in k) for vid, k in vecs}
    adj: dict[int, set[int]] = {}
    for vid, k in vecs:
        scored = []
        for wid, m in vecs:
            if wid == vid:
                continue
            dot = sum(a * b for a, b in zip(k, m))
            cos = _rnd(
                (dot / 4096.0)
                / (
                    math.sqrt(norm2[vid] / 4096.0)
                    * math.sqrt(norm2[wid] / 4096.0)
                ),
                6,
            )
            scored.append((-cos, wid))
        for _c, wid in sorted(scored)[:3]:
            # symmetrize-then-distinct: both directions exist afterwards
            adj.setdefault(vid, set()).add(wid)
            adj.setdefault(wid, set()).add(vid)

    # 3 synchronous mode rounds, tie-break (count DESC, label ASC)
    labels = {node: node for node in adj}
    for _ in range(3):
        labels = {
            node: min(
                Counter(labels[nbr] for nbr in nbrs).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for node, nbrs in adj.items()
        }
    sizes = Counter(Counter(labels.values()).values())
    want = sorted((size, n, size * n) for size, n in sizes.items())
    assert got == want, seed
    # non-vacuity: propagation must have actually merged something
    assert any(size > 1 for size, _n, _t in want), seed
