"""AQE skew-join demonstration at cluster confs (docs/SCALE.md §Joins).

`join_salted_skew` declares the STATIC hot-key fallback; this test shows the
DYNAMIC path a real cluster uses first: AQE detects the oversized shuffle
partition at runtime and splits it (`SortMergeJoin(skew=true)` +
`AQEShuffleRead skewed`) with no query rewrite.  get_session keeps AQE off
locally (8 s/plan first-run penalty — CLAUDE.md), so the cluster confs are
set per-test and restored in a finally; the data is synthetic `range()`
(no fixture scan → no cached-plan pollution across test modules).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CLUSTER_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # thresholds scaled to the test's ~MB shuffle; a cluster keeps the
    # 256MB/64MB defaults — the MECHANISM under test is identical
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
    "spark.sql.shuffle.partitions": "8",
}


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    saved: dict[str, str | None] = {}
    for k, v in _CLUSTER_CONFS.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        # 99% of fact rows land on key 0 — one shuffle partition dwarfs
        # the rest, the exact shape AQE's skew split exists for
        fact = spark.range(0, 300_000).select(
            F.when(F.col("id") % 100 != 0, F.lit(0))
            .otherwise(F.col("id") % 16)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.range(0, 17).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        )
        q = fact.join(dim, "k").select(F.sum("payload").alias("s"))
        [row] = q.collect()
        # ground truth: sum of ids NOT divisible by 100 (k=0 rows) plus
        # ids divisible by 100 whose id%16 <= 16 (all of them)
        assert row["s"] == sum(range(300_000))
        p = q._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p, p
        assert "skew=true" in p, p          # the split SMJ node
        assert "AQEShuffleRead skewed" in p, p
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
