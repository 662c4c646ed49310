"""S4 sinks + scale-path plan tests (SURVEY §2.1 S4, §4.2).

Partition pruning, bucketed shuffle-free joins, and salting are invisible
in fixture wall-clock; the assertions here are on the physical plans, which
is what actually scales.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from paraslice_spark.plans.scale import bucketed_table, salted_join
from paraslice_spark.sources.io import load_tables, write_partitioned
from tests.conftest import SF_SMALL
from tests.test_plans import plan


def test_s4_partitioned_sink_and_partition_pruning(spark, tmp_path):
    orders = load_tables(spark, SF_SMALL)["orders"]
    out = str(tmp_path / "orders_by_status")
    write_partitioned(orders, out, ["o_orderstatus"])

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    pruned = back.where(F.col("o_orderstatus") == "F")
    p = plan(pruned)
    # the status predicate must prune directories, not filter rows post-scan
    assert "PartitionFilters: [isnotnull(o_orderstatus" in p, p
    assert pruned.count() == orders.where("o_orderstatus = 'F'").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # fixture tables are under the broadcast threshold, which would bypass
    # bucketing entirely; disable it to expose the fact⋈fact scale plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = load_tables(spark, SF_SMALL)
        li = bucketed_table(spark, t["lineitem"].select("l_orderkey", "l_quantity"),
                            "li_bucketed", "l_orderkey")
        o = bucketed_table(spark, t["orders"].select("o_orderkey", "o_totalprice"),
                           "o_bucketed", "o_orderkey")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        p = plan(joined)
        assert "Exchange" not in p, p  # co-located: zero shuffles
        assert "SortMergeJoin" in p, p
        assert "Bucketed: true" in p, p
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_SMALL)
    li = t["lineitem"].select("l_orderkey", "l_linenumber")
    o = t["orders"].select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    got = salted_join(li, o, "l_orderkey")
    want = li.join(o, "l_orderkey")
    assert got.count() == want.count()
    # spot-check content equality
    g = got.groupBy().sum("o_totalprice").first()[0]
    w = want.groupBy().sum("o_totalprice").first()[0]
    assert g == pytest.approx(w, rel=1e-9)


def test_format_matrix_round_trip(spark, tmp_path):
    """S1 companions: csv/json/orc sinks round-trip a typed aggregate
    losslessly when the read passes the explicit schema back."""
    from paraslice_spark.sources.io import load_tables, read_table, write_table

    agg = (
        load_tables(spark, SF_SMALL)["orders"]
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
    )
    want = sorted(tuple(r) for r in agg.collect())
    ddl = "o_orderpriority string, n bigint, s double"
    for fmt in ("parquet", "orc", "csv", "json"):
        path = str(tmp_path / f"rt_{fmt}")
        write_table(agg, path, fmt=fmt)
        got = sorted(tuple(r) for r in read_table(spark, path, fmt=fmt, schema=ddl).collect())
        assert got == want, fmt


def test_format_matrix_rejects_unknown(spark, tmp_path):
    import pytest as _pytest

    from paraslice_spark.sources.io import read_table, write_table

    with _pytest.raises(ValueError):
        read_table(spark, "/nope", fmt="avro")


def test_sequence_pack_manifest_partitioned_write(spark, tmp_path):
    """The packing manifest's natural sink: partitioned by bucket, so a
    trainer pulling one shard's chunks prunes 15/16 of the directory tree
    at the reader — and the doc->chunk assignment table written alongside
    round-trips every doc exactly once."""
    from paraslice_spark.registry import QUERIES
    from paraslice_spark.sources.io import write_partitioned

    manifest = QUERIES["pipeline_sequence_pack"](spark, SF_SMALL)
    out = str(tmp_path / "pack_manifest")
    write_partitioned(manifest, out, ["bucket"])

    back = spark.read.parquet(out)
    assert back.count() == manifest.count()
    # one shard's read must prune by directory, not post-scan filter
    one = back.where(F.col("bucket") == "a")
    p = plan(one)
    assert "PartitionFilters: [isnotnull(bucket" in p, p
    # every doc started in exactly one (bucket, chunk)
    total_docs = back.agg(F.sum("n_docs")).first()[0]
    n_docs = load_tables(spark, SF_SMALL)["documents"].count()
    assert total_docs == n_docs


def test_sequence_pack_256_shard_sink_prunes_directories(spark, tmp_path):
    """VERDICT r7 #6: the 100 TB shard knob exercised at 256 shards — the
    2-digit manifest written partitioned must (a) prune to ONE directory
    when a single shard is read (PartitionFilters carries the equality,
    no post-scan bucket filter), (b) keep chunk ids shard-local (every
    (bucket, chunk) key unique), and (c) agree with the declared 16-way
    packing on totals (re-sharding can never create or lose doc starts)."""
    from paraslice_spark.operators.text import sequence_pack
    from paraslice_spark.registry import QUERIES
    from paraslice_spark.sources.io import load_tables, write_partitioned

    docs = load_tables(spark, SF_SMALL)["documents"]
    m256 = sequence_pack(docs, shard_digits=2)
    out = str(tmp_path / "pack256")
    write_partitioned(m256, out, ["bucket"])

    back = spark.read.parquet(out)
    n_shards = back.select("bucket").distinct().count()
    assert n_shards > 16  # genuinely finer than the declared 16-way split
    one = back.where(F.col("bucket") == "aa")
    p = plan(one)
    assert "PartitionFilters: [isnotnull(bucket" in p, p
    assert "(bucket#" in p.split("PartitionFilters")[1][:120], p
    # the bucket predicate must NOT survive as a post-scan Filter
    assert "Filter (" not in p.split("PartitionFilters")[0], p
    # chunk ids are shard-local and unique per (bucket, chunk)
    assert (
        back.groupBy("bucket", "chunk_id").count().where(F.col("count") > 1).count()
        == 0
    )
    # totals invariant vs the declared 16-way manifest
    m16 = QUERIES["pipeline_sequence_pack"](spark, SF_SMALL)
    t256 = back.agg(F.sum("n_docs"), F.sum("tok_started")).first()
    t16 = m16.agg(F.sum("n_docs"), F.sum("tok_started")).first()
    assert tuple(t256) == tuple(t16)

def test_pack_chunk_reader_invariants(spark):
    """pipeline_pack_chunk_reader's contract vs the manifest it reads for:
    (a) every non-final chunk of a bucket fills to EXACTLY 512 tokens
    (concat-then-split leaves no internal padding), (b) per-bucket filled
    tokens equal the corpus token total (the expansion neither loses nor
    double-counts), (c) docs-started per chunk (n_docs − n_carried)
    matches the manifest row-for-row."""
    from paraslice_spark.registry import QUERIES

    reader = QUERIES["pipeline_pack_chunk_reader"](spark, SF_SMALL)
    manifest = QUERIES["pipeline_sequence_pack"](spark, SF_SMALL)
    r = reader.localCheckpoint(eager=False)

    last = r.groupBy("bucket").agg(F.max("chunk_id").alias("last_chunk"))
    nonfinal_bad = (
        r.join(last, "bucket")
        .where((F.col("chunk_id") < F.col("last_chunk")) & (F.col("tok_filled") != 512))
        .count()
    )
    assert nonfinal_bad == 0

    docs = load_tables(spark, SF_SMALL)["documents"]
    total_tok = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("long"))
    ).first()[0]
    assert r.agg(F.sum("tok_filled")).first()[0] == total_tok

    started = r.select(
        "bucket", "chunk_id", (F.col("n_docs") - F.col("n_carried")).alias("n_started")
    )
    m = manifest.select("bucket", "chunk_id", F.col("n_docs").alias("n_manifest"))
    mismatch = (
        started.join(m, ["bucket", "chunk_id"], "full")
        .where(
            F.coalesce(F.col("n_started"), F.lit(0))
            != F.coalesce(F.col("n_manifest"), F.lit(0))
        )
        .count()
    )
    assert mismatch == 0
