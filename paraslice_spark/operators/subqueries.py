"""Subquery operators (SURVEY §4.1 decorrelation rows): scalar, correlated
scalar, and IN subqueries via the SQL entry point.

Catalyst rewrites all three into joins/aggregates (RewriteCorrelatedScalar-
Subquery, RewritePredicateSubquery) — asserted in tests/test_plans.py — so
at 100 TB these run as one extra aggregation + a broadcast/shuffle join,
never as a per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from paraslice_spark.registry import query
from paraslice_spark.sources.io import sql_views


@query(
    "subquery_scalar",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global-average filter)."""
    sql_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 50% above their own customer's
    average — decorrelated by Catalyst into agg + join."""
    sql_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders o
        WHERE o_totalprice > 1.5 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi rewrite."""
    sql_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """
    )
