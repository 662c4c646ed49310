"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in :mod:`paraslice_spark`; importing the operators
package populates the registry, and this module just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import paraslice_spark.operators  # noqa: F401  (registers all queries)
from paraslice_spark.registry import ORACLES, QUERIES

# Queries already graded green (rows+schema+hash or rows-only-by-design) in
# CORRECTNESS_r01.json.  Round 1's driver graded exactly the first 50 queries
# in registration order and stopped, leaving the other 50 without a verdict
# (VERDICT.md "Next round" #1) — so we order the dicts with not-yet-green
# queries FIRST.  Anything newly added or previously failed also sorts first
# automatically (it isn't in this tuple).
_R1_GREEN: tuple[str, ...] = (
    "stream_tumbling_counts", "stream_sliding_avg", "stream_session_windows",
    "stream_dedup_exact", "udf_scalar_py", "udf_pandas_vectorized",
    "udf_grouped_map", "udf_udtf_tokenize", "agg_pricing_summary",
    "agg_global", "agg_count_distinct", "agg_approx_distinct",
    "agg_multi_distinct", "agg_conditional", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_string_concat", "agg_histogram", "agg_stats",
    "agg_percentile", "agg_max_by", "q10_returned_revenue", "q14_promo_share",
    "q3_shipping_priority", "join_broadcast_inner", "join_sortmerge_inner",
    "join_star_5way", "join_left_outer", "join_full_outer", "join_semi",
    "join_anti", "join_cross", "join_range_theta", "join_time_interval",
    "join_asof", "join_self_sequences", "multimodal_decode_meta",
    "scan_parquet", "scan_events_ts", "scan_projection",
    "project_arithmetic", "filter_compound", "filter_between_in_like",
    "filter_null_semantics", "filter_regexp", "agg_pivot", "reshape_unpivot",
)


def _rotated(d: dict) -> dict:
    """Not-yet-driver-green queries first, round-1 greens last."""
    green = set(_R1_GREEN)
    first = {k: v for k, v in d.items() if k not in green}
    rest = {k: v for k, v in d.items() if k in green}
    return {**first, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.4) on /root/testdata/sf0.001."""
    return QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each hash-checkable query; non-SQL-expressible
    ops are intentionally absent (driver records rows-only)."""
    return _rotated(ORACLES)
