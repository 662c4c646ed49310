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

from paraslice_spark.functions.canon import cents_sum, rev_cents
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
