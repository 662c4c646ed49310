"""Golden oracle-diff tests for every declared query (SURVEY §5.2 layer 1).

Parametrized over the registry: any @query with an oracle is hash-compared
against DuckDB at sf0.001 (and sf0.01 for the flagship — the driver's sf).
Oracle-less queries get a rows-run smoke check.
"""

from __future__ import annotations

import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES, QUERIES
from tests.conftest import SF_MED, SF_SMALL
from tests.oracle_harness import run_compare

ORACLED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match_sf0001(spark, name):
    problems = run_compare(spark, QUERIES[name], ORACLES[name], SF_SMALL)
    assert not problems, f"{name} @ sf0.001:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match_sf001(spark, name):
    problems = run_compare(spark, QUERIES[name], ORACLES[name], SF_MED)
    assert not problems, f"{name} @ sf0.01 (driver sf):\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert all(len(QUERIES[k].__query_name__) > 0 for k in QUERIES)
