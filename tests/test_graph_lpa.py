"""Invariant tests for kNN label propagation (similarity.knn_label_propagation).

Engine-internal (no DuckDB twin — the oracle would be the loop itself);
these pin the properties community detection must satisfy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paraslice_spark.operators.similarity import (
    _knn_graph_cached,
    knn_label_propagation,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def lpa(spark):
    return knn_label_propagation(spark, SF_SMALL, iters=3).collect()


def test_every_node_has_exactly_one_label(spark, lpa):
    knn = _knn_graph_cached(spark, SF_SMALL)
    nodes = {r.vec_id for r in knn.select("vec_id").distinct().collect()} | {
        r.neighbor_id for r in knn.select("neighbor_id").distinct().collect()
    }
    assert len(lpa) == len({r.node for r in lpa}) == len(nodes)


def test_labels_are_node_ids(lpa):
    nodes = {r.node for r in lpa}
    assert {r.lbl for r in lpa} <= nodes


def test_deterministic_replay(spark, lpa):
    again = knn_label_propagation(spark, SF_SMALL, iters=3).collect()
    assert sorted((r.node, r.lbl) for r in lpa) == sorted(
        (r.node, r.lbl) for r in again
    )


def test_communities_coarser_than_singletons(lpa):
    """After 3 rounds on a kNN graph (out-degree k for every node) labels
    must have coalesced below one-community-per-node, and no community
    may swallow everything on a near-random embedding corpus."""
    n_nodes = len(lpa)
    n_comms = len({r.lbl for r in lpa})
    assert 1 < n_comms < n_nodes


def test_plan_chains_rounds_without_extra_scans(spark):
    """The 3 rounds chain into one linear plan rooted on the memoized kNN
    checkpoint — no parquet re-scan per round (pagerank's contract)."""
    df = knn_label_propagation(spark, SF_SMALL, iters=3)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in p, p
