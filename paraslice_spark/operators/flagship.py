"""Flagship query (SURVEY §7.4): Q3-style shipping priority.

customer ⋈ orders ⋈ lineitem with segment+date filters, decimal-exact
revenue agg, deterministic top-10. Exercises scan → broadcast join →
sort-merge join → partial/final hash agg → TakeOrderedAndProject in one
plan. Physical intent at scale: customer is the small dim (broadcast);
lineitem ⋈ orders shuffles on the join key and AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import cents, cents_sum, rev_cents
from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables

_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_revenue", oracle=_Q10_ORACLE)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns —
    fact⋈fact shuffle + two broadcast dims + top-k."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(cents_sum(rev_cents(), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q14_ORACLE = """
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(round(l_extendedprice*100) AS BIGINT)
                               * (100 - CAST(round(l_discount*100) AS BIGINT))
                          ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE),
       6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
"""


@query("q14_promo_share", oracle=_Q14_ORACLE)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional agg ratio over a
    broadcast dim join; exact integer sums, one rounded division."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = rev_cents()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    total = F.sum(rev)
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = t["lineitem"].where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(cents_sum(rev_cents(), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
           / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — pure scan-side filter +
    global agg, THE predicate-pushdown showcase (no join, no shuffle except
    the final 1-row reduce).  The discount band compares integer CENTS
    (round(×100)) on both engines, not raw doubles: `l_discount BETWEEN
    0.05 AND 0.07` on binary floats is a cross-engine boundary trap."""
    li = load_tables(spark, sf_dir)["lineitem"]
    disc_c = cents("l_discount")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(cents_sum(cents("l_extendedprice") * disc_c, 2).alias("revenue"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(l_quantity) > 300
    ORDER BY total_qty DESC, o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — fact⋈fact shuffle, HAVING on
    the grouped sum, deterministic ordering.  l_quantity is an
    integer-valued double (≤ 50/row, ≤ ~500/order), so the double sum is
    exact and casts losslessly to BIGINT on both engines.  At scale the
    groupBy pre-aggregates map-side per l_orderkey before the customer
    broadcast joins in."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .where(F.col("total_qty") > 300)
        .repartition(1)
        .sortWithinPartitions(F.desc("total_qty"), "o_orderkey")
    )


@query(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape adapted to the fixture's columns (no
    l_commitdate/l_receiptdate here): orders counted per priority when ANY
    line item shipped > 60 days after the order date — the EXISTS
    decorrelates to a LEFT SEMI join in both engines.  The semi join keys
    on l_orderkey with the date condition as a residual, so Spark shuffles
    ids only and short-circuits per matching order."""
    t = load_tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    return (
        t["orders"]
        .join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey")) & late,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume between two nations by
    ship year — fact⋈fact shuffle plus broadcast dims, a symmetric
    two-nation disjunction, and a year rollup.  Physical intent at scale
    (VERDICT r5 join-order fix): nation is filtered to the two qualifying
    names FIRST, broadcast-joined into supplier and customer, and those
    reduced dims broadcast onto lineitem and orders BEFORE the
    lineitem ⋈ orders shuffle — so the fact⋈fact exchange carries only the
    ~2/25-nations survivors on each side instead of 100% of both facts.
    The cross-pair disjunction (3→7 or 7→3) is evaluated after the fact
    join, where both nation names are finally in scope; the per-side
    membership filter is already exhaustive below it.  Plan shape is
    asserted in tests/test_plans.py."""
    t = load_tables(spark, sf_dir)
    names = ("NATION_3", "NATION_7")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"]
                .where(F.col("n_name").isin(*names))
                .select(
                    F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"]
                .where(F.col("n_name").isin(*names))
                .select(
                    F.col("n_nationkey").alias("c_nk"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .select("c_custkey", "cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    line_reduced = t["lineitem"].join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    orders_reduced = t["orders"].join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        line_reduced
        .join(orders_reduced, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(cents_sum(rev_cents(), 2).alias("revenue"))
        .repartition(1)
        .sortWithinPartitions("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (customer ⋈ orders ⋈ lineitem ⋈ supplier
    ⋈ nation ⋈ region) with the LOCAL-supplier condition (customer and
    supplier share a nation) and a region filter.  Physical intent at
    scale: region/nation/supplier/customer broadcast in dependency order so
    the only shuffle is lineitem ⋈ orders; the region predicate prunes
    customers (and through the nation equality, suppliers) before any fact
    row is touched.  Exact cents revenue (canon.py money rule)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(cents_sum(rev_cents(), 2).alias("revenue"))
    )
