"""Cross-family consistency laws for the r15 additions, ENGINE-side (the
fuzz file pins the oracles against pure-Python references; these pin the
SPARK implementations against EACH OTHER and against raw table counts on
the real fixture — two queries that claim the same quantity must agree
to the row)."""

from __future__ import annotations

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from paraslice_spark.sources.io import load_tables
from tests.conftest import SF_SMALL


def test_jsa_and_rtf_rows_matching_agree(spark):
    """stats_join_strategy_audit and stats_runtime_filter_audit both
    compute 'fact rows whose key survives the window's exact semi/multi
    join' over the SAME ZONEMAP_PREDS windows — their per-predicate
    rows_matching columns must be identical."""
    jsa = {
        r["pred_id"]: r["rows_matching"]
        for r in QUERIES["stats_join_strategy_audit"](
            spark, SF_SMALL
        ).collect()
    }
    rtf = {
        r["pred_id"]: r["rows_matching"]
        for r in QUERIES["stats_runtime_filter_audit"](
            spark, SF_SMALL
        ).collect()
    }
    assert jsa == rtf, (jsa, rtf)


def test_cdc_family_totals_conserve(spark):
    """The three CDC rollups must agree with each other and with the raw
    events count: every change row appears in exactly one chain."""
    n_events = load_tables(spark, SF_SMALL)["events"].count()
    comp = QUERIES["cdc_log_compaction_audit"](spark, SF_SMALL).collect()
    res = QUERIES["cdc_resurrection_audit"](spark, SF_SMALL).collect()
    ulw = QUERIES["cdc_upsert_last_wins"](spark, SF_SMALL).collect()
    assert sum(r["n_change_rows"] for r in comp) == n_events
    assert sum(r["total_changes"] for r in res) == n_events
    assert sum(r["total_changes"] for r in ulw) == n_events
    n_keys = sum(r["n_keys"] for r in comp)
    assert sum(r["n_keys"] for r in res) == n_keys
    assert sum(r["n_keys"] for r in ulw) == n_keys


def test_cdc_merge_and_diff_agree_on_engine(spark):
    """The engine-side twin of the fuzzed cross-oracle law: MERGE
    classify counts/sums equal snapshot-diff counts/sums class by
    class (ins==added, del==removed, upd_changed==changed)."""
    mc = {
        r["merge_class"]: r
        for r in QUERIES["cdc_merge_classify_audit"](
            spark, SF_SMALL
        ).collect()
    }
    df = {
        r["diff_class"]: r
        for r in QUERIES["cdc_snapshot_diff"](spark, SF_SMALL).collect()
    }
    assert mc["ins"]["n_rows"] == df["added"]["n_keys"]
    assert mc["del"]["n_rows"] == df["removed"]["n_keys"]
    assert mc["upd_changed"]["n_rows"] == df["changed"]["n_keys"]
    assert mc["ins"]["sum_src_value"] == df["added"]["sum_value_after"]
    assert mc["del"]["sum_tgt_value"] == df["removed"]["sum_value_before"]
    assert (
        mc["upd_changed"]["sum_src_value"] == df["changed"]["sum_value_after"]
    )


def test_shuffle_audit_totals_match_tables(spark):
    """Partition-sizing and bucket-co-location row totals must equal the
    raw table counts at every sweep value (the census loses nothing)."""
    t = load_tables(spark, SF_SMALL)
    n_l, n_o = t["lineitem"].count(), t["orders"].count()
    for r in QUERIES["stats_partition_sizing_audit"](
        spark, SF_SMALL
    ).collect():
        assert r["n_rows"] == n_l, dict(r.asDict())
    for r in QUERIES["stats_bucket_colocation_audit"](
        spark, SF_SMALL
    ).collect():
        assert r["n_fact_rows"] == n_l and r["n_dim_rows"] == n_o
        assert r["shuffle_rows_avoided"] == n_l + n_o
    for r in QUERIES["stats_partial_agg_audit"](spark, SF_SMALL).collect():
        assert r["n_rows"] == n_l
        assert r["n_groups"] <= r["out_rows_block"] <= r["n_rows"]
        assert r["n_groups"] <= r["out_rows_hashed"] <= r["n_rows"]
