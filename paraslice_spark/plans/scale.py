"""Scale-path plan utilities (SURVEY §4.2): bucketing and skew salting.

These exist for the 100 TB design point — partition pruning, shuffle-free
co-located joins, and bounded-skew shuffles — and are exercised by
tests/test_sinks_scale.py with physical-plan assertions, because at fixture
scale their benefit is invisible in wall-clock but the *plan shape* is what
survives a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` as a bucketed+sorted table and return the catalog
    handle. Two tables bucketed the same way join with ZERO exchanges —
    the co-located fact⋈fact strategy when broadcast is impossible."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{name.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
    return spark.table(name)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a random-but-deterministic salt
    (hash of a row discriminator), the dim side is replicated across all
    salt values, and the join key becomes (key, salt) — a single hot key
    spreads over ``salt_buckets`` reducers. AQE's OptimizeSkewedJoin does
    this adaptively at runtime; this is the explicit form for when the skew
    is known ahead of time (SURVEY §4.2).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt_buckets)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")
