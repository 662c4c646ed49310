"""Sorts / limits / top-k (SURVEY §2.7) and set operations (§2.8).

Determinism rules (SURVEY §5.3): every ORDER BY + LIMIT carries a unique
tiebreak column, and NULL placement is always explicit (Spark default is
NULLS FIRST asc; DuckDB's is NULLS LAST).

Scale notes: orderBy().limit(k) compiles to TakeOrderedAndProjectExec —
per-partition top-k then a k-row merge on the driver, never a global sort.
offset+limit still requires the global-order prefix, fine for pagination-
sized m; set ops compile to aggregate/join rewrites (§4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from paraslice_spark.registry import query
from paraslice_spark.sources.io import load_tables

# --------------------------------------------------------------- §2.7 sorts


@query(
    "sort_multikey_nulls",
    oracle="""
    SELECT NULLIF(l_returnflag, 'N') AS rf, l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY rf ASC NULLS LAST, l_orderkey DESC, l_linenumber
    LIMIT 100
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key sort with explicit NULL placement (nulls manufactured
    via NULLIF; LIMIT makes placement observable in the hash)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.select(
            F.nullif(F.col("l_returnflag"), F.lit("N")).alias("rf"),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
        )
        .orderBy(F.col("rf").asc_nulls_last(), F.col("l_orderkey").desc(), "l_linenumber")
        .limit(100)
    )


@query(
    "topk_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k -> TakeOrderedAndProject (no full sort at scale)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("price"))
        .orderBy(F.col("price").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: pagination with a total order."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
        .orderBy(F.col("price").desc(), "o_orderkey")
        .offset(10)
        .limit(20)
    )


# ------------------------------------------------------------- §2.8 set ops


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_nationkey, s_acctbal FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: bag union, schema-aligned by name."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = t["supplier"].select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: set union (distinct)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: INTERSECT (distinct) -> semi-join rewrite in Catalyst."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: EXCEPT (distinct) -> anti-join rewrite in Catalyst."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: bag EXCEPT ALL (multiplicity-aware)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(F.col("o_custkey").alias("custkey"))
    c = t["customer"].select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT ALL
    SELECT c_custkey FROM customer
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5b: bag INTERSECT ALL."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].select(F.col("o_custkey").alias("custkey"))
    c = t["customer"].select(F.col("c_custkey").alias("custkey"))
    return o.intersectAll(c)
