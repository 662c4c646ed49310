"""Entry point 2 (SURVEY §3.2): ANSI SQL text over the registered temp views.

The portable subset of the oracle SQL runs verbatim on BOTH engines, so
`spark.sql(oracle)` must reproduce the DataFrame-API query's rows exactly —
proving a reference user can keep their SQL and just point it at the views
load_tables registers (S5)."""

from __future__ import annotations

import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES, QUERIES
from paraslice_spark.sources.io import sql_views
from tests.conftest import SF_SMALL

#: oracle strings that are engine-portable ANSI (no list_*/epoch_ns/LATERAL)
PORTABLE = [
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q12_late_lines_priority",
    "q18_large_orders",
    "q5_local_supplier_volume",
    "agg_pricing_summary",
]


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_entry_matches_dataframe_api(spark, name):
    # re-POINT the views, don't just load: load_tables registers views only
    # on first load per (session, sf), so a preceding test that loaded a
    # different sf leaves the global view names aimed at ITS data (caught
    # as an order-dependent 10× mismatch when test_sketches' SF_MED load
    # ran first)
    sql_views(spark, SF_SMALL)
    via_sql = {tuple(r) for r in spark.sql(ORACLES[name]).collect()}
    via_api = {tuple(r) for r in QUERIES[name](spark, SF_SMALL).collect()}
    assert via_sql == via_api and via_api, (name, via_sql ^ via_api)
