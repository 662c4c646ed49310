"""Aggregations (SURVEY §2.4): A1-A13.

All HashAggregateExec with automatic partial (map-side) + final phases —
at 100 TB the shuffle carries one row per (partition, group), never raw
rows. Money sums are decimal-exact then cast to double once, so results are
independent of partial-aggregation order (canon.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import (
    cents,
    cents_sum,
    md5_u32,
    md5_u32_sql,
    micros_units,
    rnd,
)
from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables, sql_views

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_base_price,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))
                * (100 + CAST(round(l_tax*100) AS BIGINT)))
            AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
         AS avg_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
         AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", oracle=_Q1_ORACLE)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: TPC-H Q1 shape — the canonical scan+hash-agg benchmark query.
    Integer-cents sums (exact, order-independent); avg = sum / count with
    the division order written identically on both sides."""
    li = load_tables(spark, sf_dir)["lineitem"].where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc = 100 - cents("l_discount")
    tax = 100 + cents("l_tax")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        cents_sum(cents("l_quantity")).alias("sum_qty"),
        cents_sum(cents("l_extendedprice")).alias("sum_base_price"),
        cents_sum(cents("l_extendedprice") * disc, 2).alias("sum_disc_price"),
        cents_sum(cents("l_extendedprice") * disc * tax, 3).alias("sum_charge"),
        (cents_sum(cents("l_quantity")) / n).alias("avg_qty"),
        (cents_sum(cents("l_extendedprice")) / n).alias("avg_price"),
        n.alias("count_order"),
    )


@query(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: table-wide aggregation, no grouping."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        cents_sum(cents("o_totalprice")).alias("sum_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact distinct per group (expand + two-phase agg in Spark)."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("agg_approx_distinct")  # rows-only: HLL estimates differ by engine
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: HLL++ approximate distinct — the 100 TB path for distinct counts
    (fixed-size sketch mergeable across partitions; no expand shuffle)."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", 0.02).alias("approx_events"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: two distinct aggregates over different columns in one pass."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
           CAST(SUM(CASE WHEN o_totalprice > 200000
                         THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS DOUBLE)
             / 100.0 AS big_revenue,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: sum/count(CASE WHEN …) — manual pivot-style conditional agg."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        (
            F.sum(F.when(F.col("o_totalprice") > 200000, cents("o_totalprice"))).cast("double")
            / 100.0
        ).alias("big_revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal,
           CAST(GROUPING(c_nationkey) AS INT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_segment
    FROM customer GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: hierarchy subtotals (nation -> segment -> grand total)."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.rollup("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        cents_sum(cents("c_acctbal")).alias("sum_bal"),
        F.grouping("c_nationkey").cast("int").alias("g_nation"),
        F.grouping("c_mktsegment").cast("int").alias("g_segment"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
           CAST(GROUPING(c_nationkey) AS INT) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_segment
    FROM customer GROUP BY CUBE (c_nationkey, c_mktsegment)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: all grouping combinations."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.cube("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("c_nationkey").cast("int").alias("g_nation"),
        F.grouping("c_mktsegment").cast("int").alias("g_segment"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: explicit grouping-set list (SQL entry point over temp views)."""
    sql_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n,
               CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0
                 AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def collect_set_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 array form (internal pytest only): sorted collect_set to a real
    ``array<string>`` column.  The driver's canonicalizer cannot hash
    array-typed cells (CORRECTNESS_r01: ``unhashable type: 'numpy.ndarray'``)
    so the *declared* twin below serializes with concat_ws."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set("o_orderpriority")).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
             AS priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: set-collection, canonical (sorted) order both engines, serialized
    to one string per group so the driver's scalar-only canonicalizer can
    hash it (the array form stays pytest-checked via collect_set_array)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


def collect_list_ordered_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10b array form (internal pytest only) — see collect_set_array note."""
    o = load_tables(spark, sf_dir)["orders"]
    s = F.struct("o_orderdate", "o_orderkey", "o_orderpriority")
    return o.groupBy("o_custkey").agg(
        F.transform(
            F.sort_array(F.collect_list(s)), lambda x: x["o_orderpriority"]
        ).alias("priorities_seq")
    )


@query(
    "agg_collect_list_ordered",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderpriority, ',' ORDER BY o_orderdate, o_orderkey)
             AS priorities_seq
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_list_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10b: ORDER-DETERMINISTIC list aggregation — collect structs keyed by
    a total order, sort_array (lexicographic struct sort), project the
    payload. Spark's collect_list alone is partition-order-dependent; this
    is the portable ordered-list idiom.  Serialized to string per group for
    the driver's scalar-only hash (array form: collect_list_ordered_array)."""
    o = load_tables(spark, sf_dir)["orders"]
    s = F.struct("o_orderdate", "o_orderkey", "o_orderpriority")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(s)), lambda x: x["o_orderpriority"]
            ),
        ).alias("priorities_seq")
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderdate, o_orderkey) AS statuses
    FROM orders GROUP BY o_custkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10c: ordered string aggregation (string_agg twin)."""
    o = load_tables(spark, sf_dir)["orders"]
    s = F.struct("o_orderdate", "o_orderkey", "o_orderstatus")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",",
            F.transform(F.sort_array(F.collect_list(s)), lambda x: x["o_orderstatus"]),
        ).alias("statuses")
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: equi-width histogram.  floor(x/w)+1 on BOTH sides — width_bucket
    would clamp values >= 500000 into bucket 11 while the oracle keeps
    growing, silently diverging at sf>=1 where o_totalprice exceeds 550k
    (ADVICE r01)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy(
        (F.floor(F.col("o_totalprice") / 50000).cast("long") + 1).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(CAST(stddev_samp(c_acctbal) AS DOUBLE), 4) AS sd_bal,
           ROUND(CAST(var_pop(c_acctbal) AS DOUBLE), 4) AS var_bal,
           ROUND(CAST(avg(c_acctbal) AS DOUBLE), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: stddev/variance (inherently inexact -> rounded both sides)."""
    c = load_tables(spark, sf_dir)["customer"]
    return c.groupBy("c_mktsegment").agg(
        rnd(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        rnd(F.var_pop("c_acctbal"), 4).alias("var_bal"),
        rnd(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: exact interpolated percentiles, computed relationally.

    Spark's ``percentile`` aggregate buffers every value per group in a
    TypedImperativeAggregate (measured 10-30s at sf0.1 — and O(group size)
    memory, which dies at 100 TB). Equivalent-and-scalable form: sort-window
    row_number + the standard linear-interpolation formula
    ``h = (n-1)*p``; only the two boundary rows per group survive the agg.
    Matches DuckDB quantile_cont (both are type-7 quantiles), rounded(4).
    """
    o = load_tables(spark, sf_dir)["orders"].select("o_orderstatus", "o_totalprice")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    idx = (F.row_number().over(w) - 1).cast("double")  # 0-based rank
    n = F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus"))
    ranked = o.select(
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("v"),
        idx.alias("i"),
        (n - 1).cast("double").alias("m"),  # max 0-based index
    )

    def interp(p: float):
        h = F.col("m") * F.lit(p)
        lo, hi = F.floor(h), F.ceil(h)
        lo_v = F.max(F.when(F.col("i") == lo, F.col("v")))
        hi_v = F.max(F.when(F.col("i") == hi, F.col("v")))
        return lo_v + (F.max(h) - F.max(lo.cast("double"))) * (hi_v - lo_v)

    return ranked.groupBy("o_orderstatus").agg(
        rnd(interp(0.5), 4).alias("median_price"),
        rnd(interp(0.9), 4).alias("p90_price"),
    )


def hist_selection_frame(hist, part_col: str, value_col: str):
    """Append the cumulative-count selection columns (`cum`, `n`) to a
    per-(partition, value) COUNT HISTOGRAM (must carry `cnt`) — the
    shared machinery of exact order-statistic selection WITHOUT sorting
    raw rows (agg_percentile_histogram / events_anomaly_mad discipline;
    extracted r8 review so the three consumers cannot drift).  Windows
    run over the distinct-value list only."""
    w = Window.partitionBy(part_col).orderBy(value_col)
    wp = Window.partitionBy(part_col)
    return hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wp)
    )


def hist_at_rank(value_col: str, rank_expr: str):
    """Unaliased aggregate selecting the exact value at 1-based rank
    ``rank_expr`` from a :func:`hist_selection_frame` output: the value
    whose count span (cum-cnt, cum] covers the rank.  Exactly one row
    per group matches, so SUM is selection, not arithmetic."""
    rk = F.expr(rank_expr)
    lo = F.col("cum") - F.col("cnt")
    return F.sum(F.when((lo < rk) & (rk <= F.col("cum")), F.col(value_col)))


@query(
    "agg_percentile_histogram",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value*1000000) AS BIGINT) AS mv
      FROM events),
    r AS (
      SELECT event_type, mv,
             row_number() OVER (PARTITION BY event_type ORDER BY mv) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rk = (n + 1) // 2 THEN mv END) AS DOUBLE)
             / 1000000.0 AS p50,
           CAST(SUM(CASE WHEN rk = (9 * n + 9) // 10 THEN mv END) AS DOUBLE)
             / 1000000.0 AS p90,
           CAST(SUM(CASE WHEN rk = (99 * n + 99) // 100 THEN mv END)
                AS DOUBLE) / 1000000.0 AS p99
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def agg_percentile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 SCALE TWIN: exact nearest-rank p50/p90/p99 per event_type via
    VALUE-HISTOGRAM SELECTION — the same re-plan that fixed
    events_anomaly_mad's medians.  agg_percentile's sort-window form is
    right for high-cardinality group keys; under a LOW-cardinality key
    (|event_type| = 5) each task would sort ~N/5 raw rows, so here the
    raw table is only ever hash-aggregated into per-(type, value) counts
    (a saturating domain — 17.8k distinct values at 100k rows) and the
    rank-r order statistics are selected by cumulative count over the
    distinct-value list.  Nearest-rank (1-based rank ⌈q·n⌉) keeps every
    selected value an exact micro-unit integer — no interpolation, no
    float until the final display divisions.  The value AT a rank is
    tie-invariant, so both engines select identical integers."""
    ev = load_tables(spark, sf_dir)["events"]
    hist = (
        ev.select(
            "event_type",
            micros_units("value").alias("mv"),
        )
        .groupBy("event_type", "mv")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    r = hist_selection_frame(hist, "event_type", "mv")

    def at_rank(rank_expr: str, out: str):
        return (hist_at_rank("mv", rank_expr).cast("double") / 1000000.0).alias(
            out
        )

    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            at_rank("(n + 1) div 2", "p50"),
            at_rank("(9 * n + 9) div 10", "p90"),
            at_rank("(99 * n + 99) div 100", "p99"),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


@query(
    "agg_max_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS top_orderkey,
           CAST(MAX(o_totalprice) AS DOUBLE) AS top_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: max_by/arg_max. Per-group max o_totalprice verified untied in
    fixtures at every sf, so the picked key is deterministic."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_orderkey"),
        F.max("o_totalprice").cast("double").alias("top_price"),
    )


@query(
    "agg_decimal_money",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
             AS total_dec,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: DECIMAL-typed money aggregation (VERDICT r01 missing #5).

    The engine's default money path is integer cents (canon.py — measured
    decimal codegen stragglers + 38-digit overflow on 3-factor products),
    but users porting decimal SQL get this real DECIMAL path: exact
    decimal(12,2) sums on both engines, serialized to a scale-2 string so
    the hash compare is representation-exact.  Double→decimal casts round
    half-up identically on both engines; 2-decimal fixture values are never
    at a .005 boundary.
    """
    o = load_tables(spark, sf_dir)["orders"]
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.sum(dec).alias("s"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            F.col("s").cast("string").alias("total_dec"),
            "n_orders",
        )
    )


@query(
    "agg_money_split_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))
                    * (100 + CAST(round(l_tax*100) AS BIGINT))) AS VARCHAR)
             AS charge_micro,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_money_split_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: EXACT 3-factor money product (Q1's sum_charge =
    price*(1-disc)*(1+tax)) at unbounded group size — the canon.py 100 TB
    note made real.  Per-row fixed-point product in micro-currency
    (cents * (100-d) * (100+t), ≤ ~1.2e11) stays int64; the GROUP SUM is
    the overflow risk past ~2e7 rows/group, so it runs as a SPLIT SUM: two
    int64 accumulators over (v div 1e6, v mod 1e6) buy 1e6× headroom
    (~1e13 rows/group) with zero decimal/codegen cost in the hot path; the
    single recombine per output group is decimal(38,0).  Output serialized
    as a plain integer string — exact on both engines (DuckDB sums the
    product as HUGEINT natively; its decimal division would re-scale, so no
    decimal point crosses the hash).
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    pc = cents("l_extendedprice")
    d2 = cents("l_discount")
    t2 = cents("l_tax")
    return (
        li.withColumn("v", pc * (F.lit(100) - d2) * (F.lit(100) + t2))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("v div 1000000").alias("v_hi"),
            (F.col("v") % F.lit(1_000_000)).alias("v_lo"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("v_hi").alias("s_hi"),
            F.sum("v_lo").alias("s_lo"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            (
                F.col("s_hi").cast("decimal(38,0)") * F.lit(1_000_000)
                + F.col("s_lo").cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("charge_micro"),
            "n_lines",
        )
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: SALTED two-stage aggregation — the hand-rolled skew treatment,
    hash-matched against the plain GROUP BY.

    l_returnflag has 3 values: a direct groupBy funnels the whole table
    into 3 reduce tasks.  Stage 1 groups by (key, xxhash64(row) % 16) so
    the shuffle fans out over 48 partial groups; stage 2 re-aggregates the
    48 partials.  Counts and integer-cents sums are associative, so the
    result is EXACTLY the unsalted one (that is what the oracle proves).
    At local scale Spark's map-side partial aggregation already does this
    implicitly — the explicit salt is the portable form for skewed
    HIGH-CARDINALITY composites (hot keys among many) where map-side
    combine stops helping and AQE skew handling only covers joins."""
    li = load_tables(spark, sf_dir)["lineitem"]
    pc = cents("l_extendedprice")
    partial = (
        li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(pc).alias("s"))
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("n").alias("n_lines"),
        (F.sum("s").cast("double") / 100.0).alias("sum_price"),
    )


@query("agg_hll_sketch_merge")  # rows-only: sketch estimates are engine-specific
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18: HLL sketch MERGEABILITY — the pattern that matters at 100 TB:
    materialize per-(type, day) sketches once, then answer any coarser
    distinct-count rollup by UNIONING stored sketches instead of rescanning
    raw events.  hll_sketch_agg builds the per-day sketches (one pass),
    hll_union_agg merges them per type, and the exact twin column shows the
    estimate lands within sketch error (asserted ≤5%% rel. err. in
    tests/test_oracle.py).  Deterministic for fixed input — declared
    rows-only because no DuckDB twin shares Spark's datasketches binary."""
    ev = load_tables(spark, sf_dir)["events"]
    # day bucket from the tz-independent ts_ns longs, NOT to_date(ts): the
    # latter shifts buckets under a different spark.sql.session.timeZone —
    # the same tz-dependence class as the r3 outage (ADVICE r4).
    day = F.expr("ts_ns div 86400000000000")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_daily"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
                "approx_users_merged"
            ),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .join(
            ev.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("exact_users")
            ),
            "event_type",
        )
    )


@query(
    "agg_stats_bivariate",
    oracle="""
    SELECT o_orderstatus,
           ROUND(corr(o_totalprice, o_custkey), 4)           AS corr_pc,
           ROUND(covar_samp(o_totalprice, o_custkey), 2)     AS covs_pc,
           ROUND(covar_pop(o_totalprice, o_custkey), 2)      AS covp_pc,
           ROUND(regr_slope(o_totalprice, o_custkey), 6)     AS slope,
           ROUND(regr_intercept(o_totalprice, o_custkey), 2) AS intercept,
           ROUND(regr_r2(o_totalprice, o_custkey), 6)        AS r2
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_stats_bivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: bivariate statistics — corr, sample/population covariance, and
    the regr_* least-squares family, all single-pass mergeable moment
    aggregates (the formulas both engines share bit-stably at these
    roundings; skewness/kurtosis were tested and REJECTED — DuckDB applies
    sample bias correction where Spark computes population moments, a
    formula difference rounding can't hide).  Verified digit-identical at
    sf0.001/0.01/0.1."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.round(F.corr("o_totalprice", "o_custkey"), 4).alias("corr_pc"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("covs_pc"),
        F.round(F.covar_pop("o_totalprice", "o_custkey"), 2).alias("covp_pc"),
        F.round(F.regr_slope("o_totalprice", "o_custkey"), 6).alias("slope"),
        F.round(F.regr_intercept("o_totalprice", "o_custkey"), 2).alias("intercept"),
        F.round(F.regr_r2("o_totalprice", "o_custkey"), 6).alias("r2"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
                      COUNT(*) AS n
               FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag, v AS mode_qty, n AS mode_count
    FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY n DESC, v) AS rn
          FROM c)
    WHERE rn = 1 ORDER BY l_returnflag
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: DETERMINISTIC mode per group — Spark's built-in ``mode()``
    breaks frequency ties arbitrarily (engine/partition-order dependent),
    which can never hash-match a second engine.  The portable form is
    count-then-rank with an explicit tiebreak (highest count, then
    smallest value): two shuffles, both on grouped keys, and
    WindowGroupLimit prunes the rank to one row per partition at scale.
    l_quantity is integer-valued, so the BIGINT cast is lossless on both
    engines."""
    li = load_tables(spark, sf_dir)["lineitem"]
    c = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), "v")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("v").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
        .repartition(1)
        .sortWithinPartitions("l_returnflag")
    )


@query("agg_incremental_merge", oracle=_Q1_ORACLE)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE of the Q1 summary — the mergeable-state
    property a 100 TB pipeline leans on: yesterday's MATERIALIZED PARTIALS
    plus today's delta partials combine to the bit-identical result of a
    full recompute, so the fact table is scanned once per batch, never
    re-scanned from history.

    The two "batches" here are a deterministic orderkey-parity split of
    lineitem; each side aggregates to pure int64 state (sums in cents^k +
    the count — exactly the map-side combine state Spark itself uses),
    the union merges by key with plain SUMs (associative integer adds:
    merge order cannot matter), and ONE finalize projection applies the
    same divisions as agg_pricing_summary.  The oracle is the FULL-
    recompute Q1 SQL — the hash match IS the maintenance-correctness
    proof.  At scale: the partial table is O(groups), the delta scan is
    O(batch), and finalize is free; avg-style metrics must store
    (sum, count) state, never the divided value (averages don't merge)."""
    li = load_tables(spark, sf_dir)["lineitem"].where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )

    def partials(batch: DataFrame) -> DataFrame:
        disc = 100 - cents("l_discount")
        tax = 100 + cents("l_tax")
        return batch.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(cents("l_quantity")).alias("qty_c"),
            F.sum(cents("l_extendedprice")).alias("base_c"),
            F.sum(cents("l_extendedprice") * disc).alias("disc_c2"),
            F.sum(cents("l_extendedprice") * disc * tax).alias("charge_c3"),
            F.count(F.lit(1)).alias("n"),
        )

    merged = (
        partials(li.where(F.col("l_orderkey") % 2 == 0))
        .unionByName(partials(li.where(F.col("l_orderkey") % 2 == 1)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty_c").alias("qty_c"),
            F.sum("base_c").alias("base_c"),
            F.sum("disc_c2").alias("disc_c2"),
            F.sum("charge_c3").alias("charge_c3"),
            F.sum("n").alias("n"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("qty_c").cast("double") / 100.0).alias("sum_qty"),
        (F.col("base_c").cast("double") / 100.0).alias("sum_base_price"),
        (F.col("disc_c2").cast("double") / 10000.0).alias("sum_disc_price"),
        (F.col("charge_c3").cast("double") / 1000000.0).alias("sum_charge"),
        (F.col("qty_c").cast("double") / 100.0 / F.col("n")).alias("avg_qty"),
        (F.col("base_c").cast("double") / 100.0 / F.col("n")).alias("avg_price"),
        F.col("n").alias("count_order"),
    )


#: Count-Min affine rows: small A keeps A*h + B < 2**63 for h < 2**32
#: (the overflow-free md5-affine idiom from operators/similarity._MH_AB).
_CMS_AB: tuple[tuple[int, int], ...] = (
    (131071, 524287),
    (786433, 196613),
    (919393, 374321),
    (611953, 786431),
)
_CMS_P = 2147483647  # 2**31 - 1 (Mersenne), same modulus as MinHash
_CMS_W = 256  # buckets per row; d=4 rows -> 1024 int64 counters total


def cms_hash(col: str = "user_id"):
    """int64 base hash for the CMS (first 8 md5 hex digits of the key) —
    the single Spark-side definition every CMS consumer (this batch
    audit, streaming.stream_countmin_counters, tests) must use; the
    replay==batch cell-for-cell contract rests on it being shared, not
    copied (r8 review)."""
    return md5_u32(col)


def cms_buckets(h):
    """posexplode'd (j, bucket) generator for a base-hash column — the
    d=4 md5-affine bucket rule paired with :func:`cms_hash`."""
    return F.posexplode(
        F.array(
            *[((F.lit(a) * h + F.lit(b)) % _CMS_P) % _CMS_W for a, b in _CMS_AB]
        )
    )


@query(
    "agg_countmin_topk_error",
    oracle=f"""
    WITH h AS (
      SELECT user_id,
             {md5_u32_sql("user_id")} AS h,
             COUNT(*) AS exact_n
      FROM events GROUP BY 1),
    ab AS (
      SELECT j.j AS j,
             ([{",".join(str(a) for a, _ in _CMS_AB)}])[j.j + 1] AS a,
             ([{",".join(str(b) for _, b in _CMS_AB)}])[j.j + 1] AS b
      FROM (SELECT unnest(range({len(_CMS_AB)})) AS j) j),
    buckets AS (
      SELECT h.user_id, h.exact_n, ab.j,
             ((ab.a * h.h + ab.b) % {_CMS_P}) % {_CMS_W} AS bucket
      FROM h CROSS JOIN ab),
    counters AS (
      SELECT j, bucket, CAST(SUM(exact_n) AS BIGINT) AS cnt
      FROM buckets GROUP BY 1, 2),
    est AS (
      SELECT b.user_id, b.exact_n, MIN(c.cnt) AS cms_n
      FROM buckets b JOIN counters c USING (j, bucket)
      GROUP BY 1, 2),
    top AS (
      SELECT user_id, exact_n, cms_n
      FROM est ORDER BY exact_n DESC, user_id LIMIT 10)
    SELECT user_id, exact_n, cms_n, cms_n - exact_n AS overest
    FROM top
    """,
)
def agg_countmin_topk_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH with an exact error audit — the mergeable
    heavy-hitter sketch (Cormode & Muthukrishnan '05) next to its exact
    twin (events_heavy_hitters), the same exact-vs-sketch calibration
    contract as dedup_minhash_estimate_error: for the top-10 users by
    exact traffic, the d=4 x w=256 sketch estimate and its overestimate
    (CMS never underestimates — overest >= 0 is a structural invariant
    the oracle re-derives digit-for-digit).

    Fully hash-oracled because every hash is md5-affine ((A*h + B) mod
    (2^31-1) mod w, A small enough that A*h never overflows int64) —
    DuckDB rebuilds all 1024 counters exactly.  Scale shape: the counter
    table is FIXED-SIZE (d*w int64 cells) regardless of corpus size —
    partial-aggregated map-side, one tiny shuffle, then BROADCAST back
    for estimate lookup; at 100 TB this is the store-sketch/merge-later
    rollup (agg_hll_sketch_merge's contract) for counts instead of
    distincts.  Per-user exact counts here share one events scan with
    the probe side.

    Measured calibration (the audit's purpose): at sf0.01 (150 users)
    the top-10 overestimates are all 0 — w=256 absorbs the key space;
    at sf0.1 (1.5k users) they run 127-400 on exact counts of ~90,
    which is the audit telling you w must grow with key cardinality
    (w ~ e/eps keys for eps relative error) before trusting the sketch
    at the next scale-up."""
    e = load_tables(spark, sf_dir)["events"]
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    h = per_user.withColumn("h", cms_hash())
    buckets = h.select(
        "user_id",
        "exact_n",
        cms_buckets(F.col("h")).alias("j", "bucket"),
    )
    counters = buckets.groupBy("j", "bucket").agg(F.sum("exact_n").alias("cnt"))
    est = (
        buckets.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    return (
        est.orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
        .select(
            "user_id",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overest"),
        )
    )


@query(
    "agg_cms_selfjoin_size",
    oracle=f"""
    WITH k AS (
      SELECT l_partkey,
             {md5_u32_sql("l_partkey")} AS h,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1),
    exact AS (SELECT CAST(SUM(n * n) AS BIGINT) AS exact_size FROM k),
    ab AS (
      SELECT j.j AS j,
             ([{",".join(str(a) for a, _ in _CMS_AB)}])[j.j + 1] AS a,
             ([{",".join(str(b) for _, b in _CMS_AB)}])[j.j + 1] AS b
      FROM (SELECT unnest(range({len(_CMS_AB)})) AS j) j),
    counters AS (
      SELECT ab.j, ((ab.a * k.h + ab.b) % {_CMS_P}) % {_CMS_W} AS bucket,
             CAST(SUM(k.n) AS BIGINT) AS cnt
      FROM k CROSS JOIN ab GROUP BY 1, 2),
    est AS (
      SELECT CAST(MIN(row_est) AS BIGINT) AS cms_est
      FROM (SELECT j, SUM(cnt * cnt) AS row_est
            FROM counters GROUP BY j))
    SELECT exact_size, cms_est,
           cms_est - exact_size AS overest,
           (cms_est - exact_size) * 1000000 // exact_size AS rel_err_ppm
    FROM exact CROSS JOIN est
    """,
)
def agg_cms_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY ESTIMATION from the Count-Min sketch — the
    planner-side use of the same d=4 x w=256 counter table
    agg_countmin_topk_error maintains: |R join_k R| = sum_k n_k^2 is
    estimated as min_j sum_b cnt_j[b]^2 (the CM inner-product estimate,
    Cormode & Muthukrishnan '05 §4.2 — every term nonnegative, so the
    estimate NEVER underestimates and `overest >= 0` is structural,
    which the exact twin verifies along with the integer ppm error).

    This is the audit you run before a 100 TB self-join on a skewed key:
    the exact side costs a full groupBy; the sketch side is a fixed
    1 KB-state rollup you'd maintain incrementally (store-sketch/
    merge-later), and the declared query measures exactly how much the
    collision noise inflates the predicted join size at this key
    cardinality.  All integer: counters are exact int64 sums over
    md5-affine buckets (shared cms_hash/cms_buckets definitions), both
    sides reconstruct cell-for-cell in DuckDB; cnt^2 sums stay < 2^63
    to ~3e9 rows per sketch row (DuckDB HUGEINT is the overflow canary).

    Scale shape: per-key counts = one map-combined shuffle; the sketch =
    a 1024-cell rollup of that table; both estimates reduce to ONE row.
    The n^2/cnt^2 squaring happens on the aggregated tables, never on
    the fact table."""
    li = load_tables(spark, sf_dir)["lineitem"]
    k = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("h", cms_hash("l_partkey"))
        .localCheckpoint(eager=False)  # feeds exact + counters (no shared subplan)
    )
    exact = k.agg(F.sum(F.col("n") * F.col("n")).alias("exact_size"))
    counters = (
        k.select(cms_buckets(F.col("h")).alias("j", "bucket"), "n")
        .groupBy("j", "bucket")
        .agg(F.sum("n").alias("cnt"))
    )
    est = (
        counters.groupBy("j")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("row_est"))
        .agg(F.min("row_est").alias("cms_est"))
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "exact_size",
            "cms_est",
            (F.col("cms_est") - F.col("exact_size")).alias("overest"),
            F.expr(
                "(cms_est - exact_size) * 1000000 div exact_size"
            ).alias("rel_err_ppm"),
        )
    )


_KMV_K = 64  # sketch size: k smallest hashes retained per group


@query(
    "agg_kmv_distinct_error",
    oracle=f"""
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (SELECT event_type, {md5_u32_sql("user_id")} AS h FROM u),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS rk,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM h),
    g AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS exact_n,
                 CAST(SUM(CASE WHEN rk = {_KMV_K} THEN h END) AS BIGINT)
                   AS vk
          FROM r GROUP BY event_type)
    SELECT event_type, exact_n,
           CASE WHEN vk IS NULL THEN exact_n
                ELSE ({_KMV_K} - 1) * 4294967296 // vk END AS kmv_n,
           CASE WHEN vk IS NULL THEN CAST(0 AS BIGINT)
                ELSE ({_KMV_K} - 1) * 4294967296 // vk - exact_n END AS err
    FROM g ORDER BY event_type
    """,
)
def agg_kmv_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT-COUNT sketch with an exact error
    audit — the distinct-counting member of the exactly-verifiable
    sketch family (Bar-Yossef et al. '02: the k-th smallest of uniform
    hashes estimates cardinality as (k-1)/v_k).  agg_approx_distinct
    (HLL) stays rows-only because Spark's HLL register layout is
    engine-internal; KMV over the shared md5-u32 rule is REBUILDABLE
    digit-for-digit in DuckDB, so this is the declared, hash-oracled
    distinct sketch — per event_type: exact distinct users, the k=64
    estimate (k-1)·2³²/v_k (pure integer floor-div; groups with fewer
    than k distinct keys fall back to exact — the standard KMV rule),
    and the signed error.

    Scale shape: the only pass over raw events is the (type, user)
    dedup (one shuffle); the rank window partitions by type over the
    DISTINCT-user table and Spark prunes it to k rows per partition via
    WindowGroupLimit before the exchange (the sample_bottom_k shape —
    KMV state IS a bottom-k reservoir of hashes, mergeable by
    union+re-truncate, which is why it store-sketches at 100 TB).

    Measured calibration (the audit's point): sf0.001 has 15 users/type
    (< k, fallback exact, err 0); sf0.01 (150 users) estimates 144,
    err −6 (−4%); sf0.1 (1.5k users) estimates 1944, err +444 (+30% —
    within 3σ of the 1/√63 ≈ 12.6% envelope, and the SAME error for all
    five types because the fixture's user population is shared across
    types, so all five sketches see identical hash sets).  Read the err
    column before trusting k=64 at the next scale-up; k is the knob."""
    ev = load_tables(spark, sf_dir)["events"]
    # u feeds the exact rollup AND the sketch path (no shared subplan in
    # Catalyst) — one materialization (the multi-consumer rule)
    u = (
        ev.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    exact = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    h = u.select("event_type", md5_u32("user_id").alias("h"))
    # the rank window stands ALONE so its rk <= k filter plans as
    # WindowGroupLimit (k rows per partition survive the partial pass);
    # fusing the exact count into the same window frame would force every
    # row through (count-all blocks the prune — measured in the first cut)
    w = Window.partitionBy("event_type").orderBy("h")
    vk = (
        h.select(
            "event_type", "h", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") == _KMV_K)
        .select("event_type", F.col("h").alias("vk"))
    )
    g = exact.join(F.broadcast(vk), "event_type", "left")
    est = F.when(F.col("vk").isNull(), F.col("exact_n")).otherwise(
        F.expr(f"({_KMV_K} - 1) * 4294967296 div vk")
    )
    return (
        g.select(
            "event_type",
            "exact_n",
            est.alias("kmv_n"),
            (est - F.col("exact_n")).alias("err"),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


# --- exact rank statistics ---------------------------------------------------


@query(
    "lineitem_mannwhitney_u",
    oracle="""
    WITH q AS (
      SELECT CAST(ROUND(l_quantity) AS BIGINT) AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    byv AS (SELECT v, SUM(g1) AS c1, SUM(1 - g1) AS c2 FROM q GROUP BY v),
    r AS (
      SELECT v, c1, c2,
             COALESCE(SUM(c1 + c2) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum
      FROM byv
    ),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (2 * cum + c1 + c2 + 1)) AS BIGINT) AS two_r1,
             CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
                  AS BIGINT) AS tie_term
      FROM r
    )
    SELECT n1, n2,
           CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1, tie_term,
           ROUND(CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                 / CAST(n1 * n2 AS DOUBLE), 6) AS cles,
           ROUND((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST(n1 * n2 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                        * (CAST(n1 + n2 + 1 AS DOUBLE)
                           - CAST(tie_term AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * CAST(n1 + n2 - 1 AS DOUBLE)))), 6) AS z
    FROM s
    """,
)
def lineitem_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U — the nonparametric two-sample location test,
    computed EXACTLY from the tie-count histogram (returned vs shipped-ok
    line quantities): ranks never touch a row.  Group by value gives
    (c1, c2) tie counts; with cum = items strictly below v, the rank-sum
    identity Σ 2·avg_rank = c1·(2·cum + t + 1) per tie group (t = c1+c2)
    makes 2R₁ — and therefore 2U₁ = 2R₁ − 2·n1(n1+1)/2 — exact int64.
    The tie-corrected normal approximation's z and the common-language
    effect size U/(n1·n2) are each ONE structured double expression over
    those exact integers (house one-division rule; corr/covar precedent
    says rnd(6) is engine-stable).

    Scale shape: one shuffle (groupBy value) collapses the fact table to
    the VALUE VOCABULARY (50 distinct quantities), so the running-count
    window is over 50 rows — bounded by cardinality, not data; the same
    histogram-not-rows idiom as hist_selection_frame.  Overflow audit:
    2R₁ ≤ 2·max(c1)·N stays < 2⁶³ past 10⁸ rows; tie_term's t³ is the
    first to overflow (~10⁸ rows per tie group) — at that scale swap the
    tie_term column to DECIMAL(38,0)/HUGEINT (cusum precedent)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    q = li.where(F.col("l_returnflag").isin("R", "N")).select(
        F.round(F.col("l_quantity")).cast("long").alias("v"),
        F.when(F.col("l_returnflag") == "R", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("g1"),
    )
    byv = q.groupBy("v").agg(
        F.sum("g1").alias("c1"), F.sum(F.lit(1) - F.col("g1")).alias("c2")
    )
    # the window runs over the 50-row value vocabulary, not the fact table
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = byv.withColumn(
        "cum", F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(w), F.lit(0))
    )
    t = F.col("c1") + F.col("c2")
    s = r.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum") + t + 1)).alias("two_r1"),
        F.sum(t * t * t - t).alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    two_u1 = F.col("two_r1") - n1 * (n1 + 1)
    u1d = two_u1.cast("double") / 2.0
    nn = (n1 * n2).cast("double")
    var = nn / 12.0 * (
        (n1 + n2 + 1).cast("double")
        - F.col("tie_term").cast("double")
        / ((n1 + n2).cast("double") * (n1 + n2 - 1).cast("double"))
    )
    return s.select(
        n1,
        n2,
        two_u1.cast("long").alias("two_u1"),
        "tie_term",
        rnd(u1d / nn, 6).alias("cles"),
        rnd((u1d - nn / 2.0) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "orders_ks_price_shift",
    oracle="""
    WITH q AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    byv AS MATERIALIZED (
      -- referenced by c AND t: inlined, DuckDB re-aggregates orders per
      -- reference (house trap; mirrors the Spark side's localCheckpoint)
      SELECT v, SUM(g1) AS c1, SUM(1 - g1) AS c2 FROM q GROUP BY v),
    c AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS r1,
                 SUM(c2) OVER (ORDER BY v) AS r2
          FROM byv),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2 FROM byv)
    SELECT n1, n2,
           CAST(ABS(r1 * n2 - r2 * n1) AS BIGINT) AS d_num,
           ROUND(CAST(ABS(r1 * n2 - r2 * n1) AS DOUBLE)
                 / CAST(n1 * n2 AS DOUBLE), 6) AS ks_d,
           v AS ks_at_cents,
           CAST(r1 AS BIGINT) AS ecdf1_cnt, CAST(r2 AS BIGINT) AS ecdf2_cnt
    FROM c, t
    ORDER BY ABS(r1 * n2 - r2 * n1) DESC, v LIMIT 1
    """,
)
def orders_ks_price_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV distance between the order-value
    distributions of urgent vs low-priority orders — EXACT via integer
    cross-multiplication: at every pooled distinct price (int64 cents),
    D's numerator |R₁·n2 − R₂·n1| is an exact int64, the sup is an exact
    argmax (min-price tiebreak → the LIMIT 1 boundary is tie-free), and
    ks_d is ONE IEEE division of two exact integers → ROUND(,6) is
    engine-stable.  Output also pins the ECDF step counts at the argmax.

    Scale shape: full-cardinality values (prices are ~all distinct), so
    the running counts use the house TWO-LEVEL PREFIX SCAN instead of one
    unpartitioned window (the customer_revenue_deciles re-plan lesson):
    level 1 — per-$10k-bucket inclusive cumsums, windows partitioned by
    bucket; level 2 — exclusive bucket offsets, a window over the ~55-row
    bucket summary, broadcast back.  One value-shuffle + one tiny
    broadcast; the argmax is TakeOrderedAndProject (LIMIT 1), never a
    global sort."""
    o = load_tables(spark, sf_dir)["orders"]
    q = o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        cents("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("g1"),
    )
    # byv feeds two consumers (the in-bucket windows and the bucket
    # summary) that share no common subplan in Catalyst — materialize the
    # distinct-value histogram once, scan the fact table once (the
    # market_basket_pairs localCheckpoint idiom)
    byv = (
        q.groupBy("v")
        .agg(F.sum("g1").alias("c1"), F.sum(F.lit(1) - F.col("g1")).alias("c2"))
        .withColumn("bkt", F.expr("v div 1000000"))
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = byv.select(
        "v",
        "bkt",
        F.sum("c1").over(w_in).alias("p1"),
        F.sum("c2").over(w_in).alias("p2"),
    )
    # bucket offsets: a window over the ~55-row bucket summary table,
    # which also carries the grand totals (no third pass over byv)
    bsum = byv.groupBy("bkt").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select(
        "bkt",
        F.coalesce(F.sum("b1").over(w_b), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("b2").over(w_b), F.lit(0)).alias("o2"),
    )
    tot = bsum.agg(F.sum("b1").alias("n1"), F.sum("b2").alias("n2"))
    c = (
        cum.join(F.broadcast(boff), "bkt")
        .select(
            "v",
            (F.col("p1") + F.col("o1")).alias("r1"),
            (F.col("p2") + F.col("o2")).alias("r2"),
        )
        .crossJoin(F.broadcast(tot))
    )
    d = F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1"))
    return (
        c.select(
            "n1",
            "n2",
            d.cast("long").alias("d_num"),
            rnd(
                d.cast("double") / (F.col("n1") * F.col("n2")).cast("double"), 6
            ).alias("ks_d"),
            F.col("v").alias("ks_at_cents"),
            F.col("r1").alias("ecdf1_cnt"),
            F.col("r2").alias("ecdf2_cnt"),
        )
        .orderBy(F.desc("d_num"), "ks_at_cents")
        .limit(1)
    )


def _rank2_map(
    byv: DataFrame, width: int, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(v, t) tie histogram -> (v, r2) where r2 = 2·(average pooled rank)
    = 2·cum_before + t + 1 — exact int64, no per-row ranking.  Running
    counts use the two-level prefix scan (in-bucket exclusive cumsum
    partitioned by v div width, exclusive bucket offsets over the tiny
    bucket summary, broadcast back) so full-cardinality value domains
    never funnel through one task.  ``extra`` columns of ``byv`` are
    carried through untouched (r15: lets Spearman fold per-value
    aggregates into the rank frame instead of joining the fact table
    back on the near-unique value)."""
    b = byv.withColumn("bkt", F.expr(f"v div {width}"))
    w_in = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = b.select(
        "v",
        "bkt",
        "t",
        *extra,
        F.coalesce(F.sum("t").over(w_in), F.lit(0)).alias("ci"),
    )
    bsum = b.groupBy("bkt").agg(F.sum("t").alias("bt"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.select(
        "bkt", F.coalesce(F.sum("bt").over(w_b), F.lit(0)).alias("off")
    )
    return cum.join(F.broadcast(boff), "bkt").select(
        "v",
        (2 * (F.col("ci") + F.col("off")) + F.col("t") + 1).alias("r2"),
        "t",
        *extra,
    )


@query(
    "lineitem_spearman_qty_price",
    oracle="""
    WITH rows_ AS MATERIALIZED (
      SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    rx AS (SELECT v, 2 * COALESCE(SUM(t) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + t + 1 AS r2
           FROM (SELECT x AS v, COUNT(*) AS t FROM rows_ GROUP BY 1)),
    ry AS (SELECT v, 2 * COALESCE(SUM(t) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + t + 1 AS r2
           FROM (SELECT y AS v, COUNT(*) AS t FROM rows_ GROUP BY 1)),
    j AS (SELECT rx.r2 AS a, ry.r2 AS b
          FROM rows_ JOIN rx ON rx.v = rows_.x JOIN ry ON ry.v = rows_.y),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(a) AS BIGINT) AS sx, CAST(SUM(b) AS BIGINT) AS sy,
                 CAST(SUM(a * a) AS BIGINT) AS sxx,
                 CAST(SUM(b * b) AS BIGINT) AS syy,
                 CAST(SUM(a * b) AS BIGINT) AS sxy
          FROM j)
    SELECT n, sx, sy, sxx, syy, sxy,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS rho
    FROM m
    """,
)
def lineitem_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION between line quantity and extended price
    — the tie-aware monotonic-association statistic next to
    agg_stats_bivariate's Pearson family.  EXACT rank moments: each
    variable's doubled average rank r2 = 2·cum_before + t + 1 is int64
    (the Mann-Whitney tie-histogram identity), rows get (r2x, r2y) by
    joining back on value, and the five Σ moments are exact int64
    (Σ(2r)² ≤ 4n³ ≈ 8.6·10¹⁷ at sf0.1 — DuckDB HUGEINT sums + CAST are
    the overflow canary; past ~10⁶ rows widen to DECIMAL).  rho is one
    structured double expression over those exact integers, identical on
    both engines → ROUND(,6) (corr/covar precedent; the >2⁵³ moments
    convert long→double identically on both sides).

    Scale shape (r15): per-variable rank maps via the two-level prefix
    scan (_rank2_map — quantity's 50-value vocabulary and price's
    near-full cardinality run the same plan, partitioned windows +
    broadcast offsets).  The fact table is never joined back: the six
    moments decompose over the rank maps (Σa = Σ_v t_v·r2_v etc.), with
    the x-rank sum folded into the per-y groupBy via the broadcast
    ≤50-row quantity map, so the only data-proportional exchange is the
    one map-combined groupBy(y).

    Fixture note: the synthetic corpus draws quantity and price
    INDEPENDENTLY (measured rho ≈ 0.001-0.003 at every SF; all
    cross-column corrs ≈ 0) — the near-zero rho is the correct value,
    and the verification strength lives in the six exact rank moments,
    not the headline statistic (the dedup_embedding_cosine
    documented-fixture-property precedent)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    rows_ = li.select(
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        cents("l_extendedprice").alias("y"),
    ).localCheckpoint(eager=False)
    rx = _rank2_map(
        rows_.groupBy(F.col("x").alias("v")).agg(F.count(F.lit(1)).alias("t")),
        8,
    )
    # r15 optimization (guide §2.3/§2.4): never join the fact table back
    # on the near-unique y.  The six moments decompose over the two rank
    # maps — sx/sxx ride the 50-row x histogram; n/sy/syy/sxy ride the
    # per-y frame, which carries Σa (the x-rank sum) folded in BEFORE its
    # groupBy, so the y-rank map attaches with zero extra fact shuffles.
    # rx is the quantity domain (≤ 50 values by TPC-H spec — a bounded
    # literal-sized map, not a corpus-growing vocabulary): broadcast.
    mx = rx.agg(
        F.sum(F.col("t") * F.col("r2")).alias("sx"),
        F.sum(F.col("t") * F.col("r2") * F.col("r2")).alias("sxx"),
    )
    ga = (
        rows_.join(
            F.broadcast(
                rx.select(F.col("v").alias("x"), F.col("r2").alias("a"))
            ),
            "x",
        )
        .groupBy(F.col("y").alias("v"))
        .agg(F.count(F.lit(1)).alias("t"), F.sum("a").alias("sa"))
    )
    gy = _rank2_map(ga, 1000000, extra=("sa",))
    m = (
        gy.agg(
            F.sum("t").alias("n"),
            F.sum(F.col("t") * F.col("r2")).alias("sy"),
            F.sum(F.col("t") * F.col("r2") * F.col("r2")).alias("syy"),
            F.sum(F.col("sa") * F.col("r2")).alias("sxy"),
        )
        .crossJoin(F.broadcast(mx))
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * syd
    den = F.sqrt(
        (nd * F.col("sxx").cast("double") - sxd * sxd)
        * (nd * F.col("syy").cast("double") - syd * syd)
    )
    return m.select("n", "sx", "sy", "sxx", "syy", "sxy", rnd(num / den, 6).alias("rho"))


#: Benford first-digit probabilities log10(1+1/d), rounded to 8 decimals —
#: the SAME literals feed the Spark expression and the SQL oracle, so the
#: expected-count arithmetic is identical double math on both engines.
_BENFORD_P = {
    1: 0.30103, 2: 0.17609126, 3: 0.12493874, 4: 0.09691001,
    5: 0.07918125, 6: 0.06694679, 7: 0.05799195, 8: 0.05115252,
    9: 0.04575749,
}


def _benford_case_sql() -> str:
    return (
        "CASE digit "
        + " ".join(f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items())
        + " END"
    )


@query(
    "orders_benford_audit",
    oracle=f"""
    WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
    d AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
                 COUNT(*) AS n
          FROM v GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS freq,
           CAST({_benford_case_sql()} AS DOUBLE) AS benford_p,
           ROUND((CAST(n AS DOUBLE)
                  - CAST(total AS DOUBLE)
                    * CAST({_benford_case_sql()} AS DOUBLE))
                 * (CAST(n AS DOUBLE)
                    - CAST(total AS DOUBLE)
                      * CAST({_benford_case_sql()} AS DOUBLE))
                 / (CAST(total AS DOUBLE)
                    * CAST({_benford_case_sql()} AS DOUBLE)), 6)
             AS chi2_contrib
    FROM d, t ORDER BY digit
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD FIRST-DIGIT AUDIT of order values — the classic
    fabricated-data / fraud screen: does the leading digit of
    o_totalprice follow log10(1+1/d)?  Leading digit extracted from the
    DECIMAL STRING of exact int64 cents (×100 never changes the leading
    digit; no float log10 whose libm could differ across engines), counts
    exact, and the per-digit chi-square contribution computed from the
    SAME 8-decimal literal probability table on both engines (shared
    _BENFORD_P constants) → ROUND(,6) engine-stable.

    Scale shape: one map-side projection + a 9-bucket hash agg; the
    grand total broadcasts back onto the digit table.  (Fixture note:
    the synthetic prices are roughly uniform in value, so the audit
    correctly REJECTS Benford here — the point is the exact pipeline.)"""
    o = load_tables(spark, sf_dir)["orders"]
    d = (
        o.select(cents("o_totalprice").alias("c"))
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        # 9 rows feeding two consumers (digit table + grand total) — one
        # fact scan, not two
        .localCheckpoint(eager=False)
    )
    t = d.agg(F.sum("n").alias("total"))
    bp = F.create_map(
        *[F.lit(x) for kv in _BENFORD_P.items() for x in kv]
    )[F.col("digit")]
    nd = F.col("n").cast("double")
    exp = F.col("total").cast("double") * bp
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            rnd(nd / F.col("total"), 6).alias("freq"),
            bp.alias("benford_p"),
            rnd((nd - exp) * (nd - exp) / exp, 6).alias("chi2_contrib"),
        )
        .repartition(1)
        .sortWithinPartitions("digit")
    )


# ---- KMV set algebra (r10) ----------------------------------------------

_KMV_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
_KMV_PAIRS = tuple(
    (a, b)
    for i, a in enumerate(_KMV_PRIORITIES)
    for b in _KMV_PRIORITIES[i + 1:]
)


def _kmv_intersection_oracle() -> str:
    flags = ",\n             ".join(
        f"MAX(CASE WHEN p = '{t}' THEN 1 ELSE 0 END) AS f{i}"
        for i, t in enumerate(_KMV_PRIORITIES)
    )
    fi = {t: i for i, t in enumerate(_KMV_PRIORITIES)}
    pair_sel = "\n      UNION ALL\n      ".join(
        f"SELECT '{a}|{b}' AS pair, h, c,"
        f" (f{fi[a]} = 1 AND f{fi[b]} = 1) AS in_both"
        f" FROM flags WHERE f{fi[a]} = 1 OR f{fi[b]} = 1"
        for a, b in _KMV_PAIRS
    )
    return f"""
    WITH u AS (
      SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders),
    flags AS MATERIALIZED (
      -- referenced by all 10 pair branches: inlined, DuckDB re-runs the
      -- dedup + pivot per branch (house CTE-inlining trap)
      SELECT c, {md5_u32_sql('c')} AS h,
             {flags}
      FROM u GROUP BY 1, 2),
    p AS MATERIALIZED (
      {pair_sel}),
    r AS (
      -- tie-break on c: an md5-u32 collision straddling rank k must pick
      -- the same row in both engines (ADVICE r10 #1)
      SELECT pair, h, in_both,
             row_number() OVER (PARTITION BY pair ORDER BY h, c) AS rk
      FROM p),
    sk AS (
      SELECT pair,
             CAST(SUM(CASE WHEN rk = {_KMV_K} THEN h END) AS BIGINT) AS vk,
             COUNT(CASE WHEN in_both THEN 1 END) AS cnt_both
      FROM r WHERE rk <= {_KMV_K} GROUP BY 1),
    ex AS (
      SELECT pair, COUNT(CASE WHEN in_both THEN 1 END) AS exact_n
      FROM p GROUP BY 1)
    -- GREATEST(vk, 1): md5_u32's range includes 0; a vk of 0 (k hashes all
    -- zero) must floor-div deterministically, not raise/NULL-diverge
    -- between engines (ADVICE r10 #2)
    SELECT ex.pair, exact_n,
           CASE WHEN vk IS NULL THEN exact_n
                ELSE (({_KMV_K} - 1) * 4294967296 // GREATEST(vk, 1))
                     * cnt_both // {_KMV_K} END AS kmv_n,
           CASE WHEN vk IS NULL THEN CAST(0 AS BIGINT)
                ELSE (({_KMV_K} - 1) * 4294967296 // GREATEST(vk, 1))
                     * cnt_both // {_KMV_K} - exact_n END AS err
    FROM ex JOIN sk USING (pair)
    """


@query("agg_kmv_intersection_error", oracle=_kmv_intersection_oracle())
def agg_kmv_intersection_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KMV SET ALGEBRA with an exact error audit — the capability that
    makes bottom-k sketches the 100 TB audience tool: two segments'
    sketches estimate their INTERSECTION without ever joining the
    segments (merge the sketches, re-truncate to k, and read the
    overlap fraction ρ̂ of the union's k minima present in both sides:
    |A∩B| ≈ ρ̂ · (k−1)·2³²/v_k — Beyer et al. '07).  Declared on the
    TPC-H audience question "how much do the customer populations of
    two order priorities overlap?": all 10 priority pairs, exact
    intersection vs the k=64 sketch estimate vs the signed error.

    The fixture gives GENUINELY PARTIAL overlap (Jaccard ≈ 0.76 at
    every SF — ~10 orders/customer across 5 priorities leave ~11 % of
    each audience un-overlapped), so the ρ̂ < 1 branch — the set-algebra
    core — is exercised at every SF, unlike the events user populations
    (every user fires every type; measured, the vacuity discipline).
    Populations ≥ 132 ≥ k even at sf0.001, so the estimator branch is
    live everywhere; the est is EXACT INTEGERS end-to-end (md5-u32
    hashes, floor-div estimate, then ·cnt_both div k — stated operation
    order, both engines floor on non-negative operands).

    Scale shape: one (priority, custkey) dedup shuffle; ONE custkey
    shuffle pivots the 5 membership flags; the 10 pair frames are a
    map-side explode of that table; the per-pair rank window stands
    alone so rk ≤ k prunes as WindowGroupLimit — only k rows per input
    partition reach the 10-partition exchange (the sample_bottom_k /
    kmv_distinct shape: KMV state IS a mergeable bottom-k reservoir),
    so 10 window partitions are a non-issue at any corpus size.  The
    exact side is the audit, priced once; production reads sketches."""
    o = load_tables(spark, sf_dir)["orders"]
    u = (
        o.select(
            F.col("o_orderpriority").alias("p"),
            F.col("o_custkey").alias("c"),
        )
        .distinct()
    )
    flag_aggs = [
        F.max(F.when(F.col("p") == t, F.lit(1)).otherwise(F.lit(0))).alias(
            f"f{i}"
        )
        for i, t in enumerate(_KMV_PRIORITIES)
    ]
    flags = u.groupBy("c").agg(*flag_aggs).select(
        md5_u32("c").alias("h"),
        "c",
        *[f"f{i}" for i in range(len(_KMV_PRIORITIES))],
    )
    fi = {t: i for i, t in enumerate(_KMV_PRIORITIES)}
    structs = [
        F.struct(
            F.lit(f"{a}|{b}").alias("pair"),
            F.col(f"f{fi[a]}").alias("fa"),
            F.col(f"f{fi[b]}").alias("fb"),
        )
        for a, b in _KMV_PAIRS
    ]
    # p feeds the exact rollup AND the sketch path (the kmv_distinct
    # multi-consumer rule) — one materialization
    p = (
        flags.select("h", "c", F.explode(F.array(*structs)).alias("s"))
        .where((F.col("s.fa") == 1) | (F.col("s.fb") == 1))
        .select(
            F.col("s.pair").alias("pair"),
            "h",
            "c",
            ((F.col("s.fa") == 1) & (F.col("s.fb") == 1)).alias("in_both"),
        )
        .localCheckpoint(eager=False)
    )
    ex = p.groupBy("pair").agg(
        F.count(F.when(F.col("in_both"), F.lit(1))).alias("exact_n")
    )
    # tie-break on c: an md5-u32 collision straddling rank k must pick the
    # same row in both engines (ADVICE r10 #1)
    w = Window.partitionBy("pair").orderBy("h", "c")
    # the rank window stands ALONE so rk <= k plans as WindowGroupLimit
    sk = (
        p.select("pair", "h", "in_both", "c", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _KMV_K)
        .groupBy("pair")
        .agg(
            F.max(F.when(F.col("rk") == _KMV_K, F.col("h"))).alias("vk"),
            F.count(F.when(F.col("in_both"), F.lit(1))).alias("cnt_both"),
        )
    )
    g = ex.join(F.broadcast(sk), "pair")
    # greatest(vk, 1): md5_u32's range includes 0; keep the 0 case a
    # deterministic floor-div rather than an engine-divergent null/error
    # (ADVICE r10 #2)
    est = F.when(F.col("vk").isNull(), F.col("exact_n")).otherwise(
        F.expr(
            f"(({_KMV_K} - 1) * 4294967296 div greatest(vk, 1))"
            f" * cnt_both div {_KMV_K}"
        )
    )
    return g.select(
        "pair",
        "exact_n",
        est.alias("kmv_n"),
        F.when(F.col("vk").isNull(), F.lit(0).cast("long"))
        .otherwise(est - F.col("exact_n"))
        .alias("err"),
    )
