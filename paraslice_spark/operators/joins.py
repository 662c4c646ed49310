"""Joins (SURVEY §2.3): J1-J12.

Physical-strategy intent at 100 TB (asserted for key shapes in
tests/test_plans.py):

- small dims (region/nation/customer-filtered) -> explicit ``F.broadcast``
  => BroadcastHashJoin, no shuffle of the fact side;
- fact ⋈ fact (lineitem ⋈ orders) -> shuffle on the join key (sort-merge);
  AQE (cluster conf) demotes to broadcast when runtime stats allow;
- non-equi joins keep one side tiny + broadcast => BroadcastNestedLoop over
  a bounded side only;
- interval joins use the coarse-bucket band-join trick so the planner gets
  an equi key and the cross product stays per-bucket, not global;
- as-of join is union-tag + window (single shuffle on the partition key),
  never a range cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import cents, cents_sum, rev_cents
from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables

_HOUR_US = 3_600_000_000  # one hour in microseconds


@query(
    "join_broadcast_inner",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
    GROUP BY p_brand
    """,
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact ⋈ small dim — dim broadcast, fact never shuffles for the join."""
    t = load_tables(spark, sf_dir)
    part = t["part"].where(F.col("p_type") == "PROMO")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(cents_sum(rev_cents(), 2).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_sortmerge_inner",
    oracle="""
    SELECT o_orderstatus, l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus, l_returnflag
    """,
)
def join_sortmerge_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact ⋈ fact — shuffles both sides on the key (sort-merge at scale)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            cents_sum(cents("l_quantity")).alias("sum_qty"),
        )
    )


@query(
    "join_star_5way",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def join_star_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: TPC-H Q5 star shape — dims broadcast, facts shuffle once each."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(cents_sum(rev_cents(), 2).alias("revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left outer — unmatched customers null-padded."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_orderstatus") == "F")
    return t["customer"].join(o, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4b: right outer — unmatched customers null-padded on the orders side
    (J4 planned left AND right outer; r1 declared only left — VERDICT
    Missing #4).  Catalyst rewrites this to a left join with sides swapped;
    the declared query keeps the user-facing right-outer surface."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_totalprice") > 400000)
    return o.join(t["customer"], F.col("o_custkey") == F.col("c_custkey"), "right").select(
        "o_orderkey", "o_totalprice", "c_custkey"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT o_orderkey, o_custkey, c_custkey, c_acctbal
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    FULL OUTER JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
      ON o.o_custkey = c.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: full outer — both sides null-padded (filters manufacture misses)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(F.col("o_totalprice") > 400000)
    c = t["customer"].where(F.col("c_acctbal") > 9000)
    return o.join(c, F.col("o_custkey") == F.col("c_custkey"), "full").select(
        "o_orderkey", "o_custkey", "c_custkey", "c_acctbal"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: left semi — customers with ≥1 urgent order, no right columns."""
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: left anti — customers with no orders at all."""
    t = load_tables(spark, sf_dir)
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: cross join of two tiny dims (5×25)."""
    t = load_tables(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@query(
    "join_range_theta",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_parts,
           CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
    FROM supplier JOIN part
      ON p_retailprice >= s_acctbal AND p_retailprice < s_acctbal + 500
    GROUP BY s_suppkey
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: non-equi band join — supplier side broadcast so the nested-loop
    scans a bounded build side only (the 100 TB-safe theta-join shape)."""
    t = load_tables(spark, sf_dir)
    s = t["supplier"].select("s_suppkey", "s_acctbal")
    cond = (F.col("p_retailprice") >= F.col("s_acctbal")) & (
        F.col("p_retailprice") < F.col("s_acctbal") + 500
    )
    return (
        t["part"]
        .join(F.broadcast(s), cond)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            cents_sum(cents("p_retailprice")).alias("sum_price"),
        )
    )


@query(
    "join_time_interval",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type,
                      date_trunc('microseconds', ts) AS ts
               FROM events)
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks
    FROM e p JOIN e c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 3600000000
    GROUP BY p.event_id
    """,
)
def join_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: interval join via the band-join trick — clicks replicated to the
    3 adjacent hour buckets, equi-join on (user, bucket), residual |Δt|≤1h
    filter. The planner gets an equi key, so at scale this shuffles per
    bucket instead of nested-looping the whole table."""
    ev = load_tables(spark, sf_dir)["events"]
    us = F.unix_micros(F.col("ts"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        us.alias("p_us"),
        # integer `div`, never float `/` (io.py:51 rule) — bit-exact on int64
        F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("bucket"),
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            us.alias("c_us"),
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("c_bucket"),
        )
        .withColumn("bucket", F.explode(F.expr("array(c_bucket - 1, c_bucket, c_bucket + 1)")))
    )
    return (
        p.join(c, (p.user_id == c.c_user_id) & (p.bucket == c.bucket))
        .where(F.abs(F.col("c_us") - F.col("p_us")) <= _HOUR_US)
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )


@query(
    "join_asof",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type,
                      date_trunc('microseconds', ts) AS ts
               FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, ts FROM e
          WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts FROM e
          WHERE event_type = 'click')
    SELECT p.purchase_id, p.user_id, c.click_id
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: as-of join — latest same-user click at-or-before each purchase.

    Spark has no native ASOF; union-tag + running last(ignorenulls) over a
    (user, time)-ordered window gives the same result with ONE shuffle on
    user_id — at 100 TB this beats any range-join formulation outright.
    (ts is unique per user in fixtures; clicks sort before purchases at
    equal ts via the tag so ties mean 'click at purchase instant counts'.)
    """
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("is_purchase"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click_id", ignorenulls=True).over(w))
        .where(F.col("is_purchase") == 1)
        .select("purchase_id", "user_id", F.col("last_click").alias("click_id"))
    )


@query(
    "join_self_sequences",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type,
                      date_trunc('microseconds', ts) AS ts
               FROM events)
    SELECT event_id, user_id, event_type,
           lag(event_type) OVER w AS prev_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def join_self_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: consecutive-event pairs per user. Self-join semantics expressed
    with lag() — one shuffle instead of a self sort-merge join (scale rule
    from SURVEY §2.3 J12). gap kept in integer µs: exact on both engines."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


_SALT_R = 8  # replication factor for the salted-join demonstration


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED SHUFFLE JOIN — the hot-key scale technique at the JOIN level
    (agg_salted_skew is its aggregation sibling): the fact side gets a
    deterministic per-row salt in [0, R), the dim side is replicated
    across all R salt values, and the join keys on (key, salt) — a key
    whose rows would all land in ONE shuffle partition now spreads over R.
    The salt is pure plan plumbing: it never reaches the output (asserted
    in tests/test_plans.py along with the salted exchange), and the
    declared result hash-matches the UNSALTED oracle join exactly.

    The fixture's orderkeys are uniform, so this declares the TECHNIQUE
    (plan shape), not a local speedup; at 100 TB you apply it when key
    stats show a hot key, or let AQE skew-join split at runtime
    (PARASLICE_AQE) — salting is the static fallback AQE can't cover,
    e.g. when one key exceeds a single executor even after splits.  The
    merge hint forces the shuffle path (a broadcast of the small fixture
    dim would defeat the demonstration; at scale the dim side wouldn't
    broadcast)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT_R)).cast("int"),
    )
    orders_rep = (
        t["orders"]
        .select("o_orderkey", "o_orderpriority")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_R)]))
        )
    )
    return (
        li.hint("merge")
        .join(
            orders_rep,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders_rep["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            cents_sum(rev_cents(), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )
