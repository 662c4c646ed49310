"""Env-gated sf0.1 hash sweep (SURVEY §5.2): the same oracle comparison the
default suite runs at sf0.001/sf0.01, against the largest local fixture.

Off by default (it re-runs every oracled query at 100× the unit-test data);
enable with PARASLICE_SWEEP_SF01=1 — the claim "swept at sf0.1" in SURVEY
§2.13 is reproducible with exactly:

    PARASLICE_SWEEP_SF01=1 python -m pytest tests/test_sweep_sf01.py -q
"""

from __future__ import annotations

import os

import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES, QUERIES
from tests.oracle_harness import run_compare

SF_LARGE = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("PARASLICE_SWEEP_SF01") != "1",
    reason="sf0.1 sweep is opt-in (PARASLICE_SWEEP_SF01=1)",
)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_sf01_sweep(spark, name):
    problems = run_compare(spark, QUERIES[name], ORACLES[name], SF_LARGE)
    assert not problems, f"{name} @ sf0.1:\n" + "\n".join(problems)
