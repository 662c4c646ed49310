"""Flagship query (SURVEY §7.4): Q3-style shipping priority.

customer ⋈ orders ⋈ lineitem with segment+date filters, decimal-exact
revenue agg, deterministic top-10. Exercises scan → broadcast join →
sort-merge join → partial/final hash agg → TakeOrderedAndProject in one
plan. Physical intent at scale: customer is the small dim (broadcast);
lineitem ⋈ orders shuffles on the join key and AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER join
    (customers with zero orders must survive as c_count = 0) feeding a
    two-level aggregation.  At scale the first agg shuffles on c_custkey
    (COUNT(o_orderkey) ignores the null rows the outer join manufactures);
    the second groups the tiny (c_count, custdist) histogram — a few dozen
    distinct counts — so the heavy exchange happens exactly once."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .repartition(1)
        .sortWithinPartitions(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH r AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(round(l_discount*100) AS BIGINT)))
                  AS BIGINT) AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 10000.0 AS revenue
    FROM supplier JOIN r ON s_suppkey = l_suppkey
    WHERE rev_c = (SELECT MAX(rev_c) FROM r)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the view + scalar-max-equality pattern.  The max comparison runs on
    EXACT integer cents² (ties included, like the spec), never on the
    divided double.  Plan: one shuffle for the per-supplier agg; the 1-row
    max broadcasts back over it (no global sort, no single-partition
    window); supplier broadcasts onto the handful of winners."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_cents()).alias("rev_c"))
    )
    mx = rev.agg(F.max("rev_c").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("rev_c") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000.0).alias("revenue"),
        )
        .repartition(1)
        .sortWithinPartitions("s_suppkey")
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates over a
    broadcast part join — the OR-of-ANDs pushdown exercise.  Catalyst can't
    derive per-branch scan bounds from the disjunction, so the REDUNDANT
    envelope conjuncts (l_quantity 1-30, p_size 1-15, brand IN the three)
    are stated explicitly — they push to both parquet scans and cut the
    join input to the union of the branches before the residual OR runs
    (the standard Q19 rewrite; at 100 TB the envelope is the difference
    between scanning 2% and 100% of lineitem)."""
    t = load_tables(spark, sf_dir)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    part = t["part"].where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 15)
    )
    line = t["lineitem"].where(F.col("l_quantity").between(1, 30))
    return (
        line.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(cents_sum(rev_cents(), 2).alias("revenue"))
    )


@query(
    "q22_dormant_balances",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(CAST(round(c_acctbal*100) AS BIGINT)) AS ab
      FROM customer WHERE c_acctbal > 0.0
    ),
    eligible AS (
      SELECT c_nationkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
      FROM customer
      WHERE CAST(round(c_acctbal*100) AS BIGINT) > (SELECT ab FROM avg_bal)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS totacctbal
    FROM eligible GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape adapted to this corpus (every customer has SOME
    order, so "dormant" = no order since 1999): above-average-balance
    customers with no recent orders, rolled up per nation — scalar-avg
    subquery + LEFT ANTI join.

    Determinism note: the threshold is AVG over integer CENTS — an exact
    int64 sum divided by an exact count is the SAME IEEE double on both
    engines regardless of summation order, so the > comparison can never
    flip cross-engine (raw double AVG would differ in the last ulp).
    Plan: the avg is a 1-row broadcast; the anti join shuffles only
    (custkey) pairs against date-filtered orders; the final rollup is 25
    nation rows."""
    t = load_tables(spark, sf_dir)
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = (
        t["customer"]
        .where(F.col("c_acctbal") > 0.0)
        .agg(F.avg(bal_c).alias("ab"))
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        t["customer"]
        .withColumn("bal_c", bal_c)
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("bal_c") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c").cast("double") / 100.0).alias("totacctbal"),
        )
        .repartition(1)
        .sortWithinPartitions("c_nationkey")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT)) AS vol_c,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_9'
                               THEN vol_c ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(vol_c) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's market share of ECONOMY-part
    revenue sold into ASIA customers, by order year — the 8-way join with
    nation playing TWO roles (customer side restricts through region;
    supplier side only labels) and a conditional-ratio agg.

    Physical intent at scale: part (type-filtered), supplier+nation,
    customer+nation+region (region-filtered) all broadcast-reduce the
    facts BEFORE the lineitem ⋈ orders shuffle — same discipline as the
    r6 q7 fix; the date filter pushes to the orders scan.  Ratio on exact
    integer cents², one rounded division per year row."""
    t = load_tables(spark, sf_dir)
    part = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].select(
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
                t["nation"].join(
                    F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev_cents().alias("vol_c"),
            "supp_nation",
        )
    )
    share = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_9", F.col("vol_c")).otherwise(F.lit(0)))
        .cast("double")
        / F.sum("vol_c").cast("double"),
        6,
    )
    return (
        vol.groupBy("o_year")
        .agg(share.alias("mkt_share"))
        .repartition(1)
        .sortWithinPartitions("o_year")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
           / 100.0 / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost if small-quantity orders (below 20% of
    the part's own average quantity) were dropped — the correlated-average
    pattern, decorrelated into a per-part agg joined back to the fact.

    Determinism: AVG(l_quantity) is an exact-integer-valued-double sum over
    an exact count, so 0.2*avg is the identical IEEE double on both
    engines and the < cut can never flip cross-engine.  At scale the
    per-part averages are a map-side-combined agg shuffled on l_partkey,
    re-joined on the same key (exchange reuse); the brand filter pushes to
    the part scan and prunes the fact via the broadcast dim."""
    t = load_tables(spark, sf_dir)
    pavg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut"))
    )
    part = t["part"].where(F.col("p_brand") == "Brand#23").select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(pavg, F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q12_late_lines_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted to the fixture (no l_shipmode /
    l_commitdate / l_receiptdate columns): late 1997 shipments grouped by
    l_returnflag instead of ship mode, "late" = shipped > 60 days after
    the order date (the q4 convention), priority split via the original's
    CASE dual-count.  Plan: the l_shipdate year-band pushes to the
    lineitem scan; the late predicate references both sides so it runs as
    a residual on the fact⋈fact join; the 3-row conditional agg is
    map-side combined."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .repartition(1)
        .sortWithinPartitions("l_returnflag")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS price_c
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    ),
    best AS (SELECT pk, MIN(price_c) AS best_c FROM offers GROUP BY pk)
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(price_c AS DOUBLE) / 100.0 AS best_price
    FROM offers
    JOIN best ON offers.pk = best.pk AND offers.price_c = best.best_c
    JOIN part ON p_partkey = offers.pk
    JOIN supplier ON s_suppkey = offers.sk
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_type = 'SMALL' AND p_size <= 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted to the fixture (no partsupp table): the
    "supply cost" of a (part, supplier) pair is the minimum observed line
    price in lineitem, restricted to EUROPE suppliers; for each SMALL
    part ≤ size 15 return the supplier(s) achieving the per-part minimum
    (ties kept, like the spec's correlated MIN).

    Plan: region⋈nation⋈supplier broadcast-reduces lineitem BEFORE its
    only shuffle (the (pk, sk) agg); the per-part MIN regroups that small
    offers table on pk and broadcast-joins back on exact integer cents
    equality — the q15 scalar-max pattern, keyed per part.  part and
    supplier attributes broadcast onto the few winners at the top."""
    t = load_tables(spark, sf_dir)
    eur_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        t["lineitem"]
        .join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min(cents("l_extendedprice")).alias("price_c"))
    )
    best = offers.groupBy("pk").agg(F.min("price_c").alias("best_c"))
    best = best.select(F.col("pk").alias("bpk"), "best_c")
    part = t["part"].where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    return (
        offers.join(
            best,
            (F.col("pk") == F.col("bpk")) & (F.col("price_c") == F.col("best_c")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("pk"))
        .join(F.broadcast(eur_supp), F.col("sk") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("price_c").cast("double") / 100.0).alias("best_price"),
        )
        .repartition(1)
        .sortWithinPartitions(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    WITH profit AS (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))
             - CAST(round(p_retailprice*100) AS BIGINT)
               * CAST(l_quantity AS BIGINT) * 10 AS amount_c2
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%red%'
    )
    SELECT nation, o_year,
           CAST(SUM(amount_c2) AS DOUBLE) / 10000.0 AS sum_profit
    FROM profit GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape adapted to the fixture (no partsupp, so no
    ps_supplycost): profit per supplier nation × order year for parts
    named '%red%', with cost proxied by 10% of p_retailprice per unit.
    All arithmetic in integer cents² (retail cents × qty × 10 = 0.1 ×
    retail in the same 1e-4-dollar unit), one final division.

    Plan: the name-filtered part dim broadcast-reduces lineitem (~1/6 of
    rows survive '%red%') and supplier⋈nation broadcasts in BEFORE the
    lineitem ⋈ orders shuffle — the q7/q8 fact-reduction discipline; the
    (nation, year) agg is map-side combined to ~25×7 groups."""
    t = load_tables(spark, sf_dir)
    part = t["part"].where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("nation"),
                )
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .select("s_suppkey", "nation")
    )
    amount = rev_cents() - cents("p_retailprice") * F.col("l_quantity").cast(
        "long"
    ) * F.lit(10)
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(cents_sum(amount, 2).alias("sum_profit"))
        .repartition(1)
        .sortWithinPartitions("nation", F.desc("o_year"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH value AS (
      SELECT l_partkey AS p_partkey,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS value_c2
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(value_c2) AS t FROM value)
    SELECT p_partkey, CAST(value_c2 AS DOUBLE) / 10000.0 AS part_value
    FROM value, tot WHERE value_c2 * 500 > t
    ORDER BY value_c2 DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape adapted to the fixture (no partsupp, so no
    availqty×supplycost): a part's "stock value" is its discounted revenue
    from NATION_5 suppliers; keep parts above 1/500 of the nation total.

    Determinism: the threshold compares exact int64 cents² via
    cross-multiplication (value_c2 * 500 > total) — no float fraction, so
    the cut can never flip cross-engine.  Plan: the nation-filtered
    supplier dim broadcast-reduces lineitem before its only shuffle (the
    per-part agg); the grand total is a 1-row broadcast back over it —
    the q15 scalar pattern with an inequality."""
    t = load_tables(spark, sf_dir)
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(rev_cents()).alias("value_c2"))
    )
    tot = value.agg(F.sum("value_c2").alias("t"))
    return (
        value.crossJoin(F.broadcast(tot))
        .where(F.col("value_c2") * 500 > F.col("t"))
        .select(
            "p_partkey",
            (F.col("value_c2").cast("double") / 10000.0).alias("part_value"),
        )
        .repartition(1)
        .sortWithinPartitions(F.desc("part_value"), "p_partkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted to the fixture (no partsupp: the
    part⇄supplier relation is observed through lineitem; no "complaints"
    comment text: negative account balance marks the excluded suppliers):
    distinct supplier count per (brand, type, size) bucket with the
    spec's NOT-IN exclusions.

    Plan: the brand/type/size filters push to the broadcast part dim; the
    excluded-supplier set (a handful of rows) broadcasts as a LEFT ANTI
    join; countDistinct shuffles (brand, type, size, suppkey) once for
    the partial-distinct expansion, then aggregates — both exchanges
    carry ids only."""
    t = load_tables(spark, sf_dir)
    part = t["part"].where(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .repartition(1)
        .sortWithinPartitions(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q20_bulk_shippers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%bolt%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey HAVING SUM(l_quantity) > 50
      )
    ORDER BY s_suppkey
    """,
)
def q20_bulk_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted to the fixture (no partsupp availqty to
    compare against, so the promotion threshold is an absolute one):
    EUROPE suppliers who shipped more than 50 units of '%bolt%' parts
    during 1997 — the nested-IN chain decorrelated into semi joins.

    Plan: the part-name subquery broadcasts as a LEFT SEMI onto the
    date-pruned lineitem scan; the per-supplier quantity agg shuffles
    supplier ids only; the HAVING survivors broadcast as the final SEMI
    against the region-filtered supplier dim.  l_quantity is
    integer-valued so SUM is exact and the > 50 cut is deterministic."""
    t = load_tables(spark, sf_dir)
    bolt_parts = t["part"].where(F.col("p_name").like("%bolt%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(bolt_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(shipped),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .repartition(1)
        .sortWithinPartitions("s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM fl l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE l1.late
      AND n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM fl l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM fl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to the fixture (no l_receiptdate /
    l_commitdate: "late" = shipped > 60 days after the order date, the
    q4/q12 convention): NATION_3 suppliers who were the ONLY late
    supplier on a finished multi-supplier order.

    Spark-first decorrelation: instead of the literal EXISTS + NOT EXISTS
    (two more passes over the fact join), collapse the fact join ONCE to
    one row per (order, supplier) with its late flag, then let a window
    over l_orderkey compute n_supp = COUNT(*) and n_late = SUM(late) in
    place: a row qualifies iff it is late, n_supp > 1 (some other
    supplier exists) and n_late = 1 (the only late supplier is itself).
    NO self-join at all — the plan is fact join → (order, supplier) agg →
    window on the agg's own partitioning (the window exchange reuses the
    groupBy's l_orderkey clustering only partially: groupBy hashes
    (order, supplier), the window re-keys to order — two id-only
    exchanges total, vs three plus a duplicate fact join in the literal
    form.  Local sf0.1 cost is UNCHANGED (~1.1 s: orders broadcasts at
    this scale so the literal form's duplicate fact join was nearly free
    — the win is structural, for the cluster regime where orders shuffles
    and computing the fact join twice doubles the dominant exchange).
    The supplier⋈nation dim
    broadcasts at the top; numwait counts rows (one per distinct order
    by construction)."""
    t = load_tables(spark, sf_dir)
    g = (
        t["lineitem"]
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    qual = (
        g.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum(F.col("late").cast("int")).over(w))
        .where(F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        qual.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .repartition(1)
        .sortWithinPartitions(F.desc("numwait"), "s_name")
    )
