"""Observation API (SURVEY §4.1 'use, don't rebuild'): pipeline metrics
ride the SAME action as the query — no second pass, no collect — which is
how a 100 TB job reports row counts / quality gauges for free."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from paraslice_spark.sources.io import load_tables
from tests.conftest import SF_SMALL


def test_observe_metrics_ride_the_single_action(spark):
    d = load_tables(spark, SF_SMALL)["documents"]
    scan_obs = Observation("scan")
    gate_obs = Observation("gate")
    gated = (
        d.observe(scan_obs, F.count(F.lit(1)).alias("rows_in"))
        .where(F.size(F.split("text", " ")) >= 20)
        .observe(
            gate_obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum("n_chars").alias("chars_out"),
        )
    )
    n_out = gated.count()  # ONE action; both observations populate from it
    assert scan_obs.get["rows_in"] == d.count()
    assert gate_obs.get["rows_out"] == n_out
    assert gate_obs.get["chars_out"] > 0
    assert scan_obs.get["rows_in"] >= gate_obs.get["rows_out"]
