"""Structural-invariant tests for the exactly-verifiable sketch family
(agg_countmin_topk_error / text_bloom_prefilter / sample_bottom_k).

The oracle tests prove cross-engine equality; these prove the SKETCH
CONTRACTS — one-sided error and mergeability — on the full key space,
not just the declared top-k slice."""

from __future__ import annotations

from pyspark.sql import functions as F

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.operators.aggregates import _CMS_AB, _CMS_P, _CMS_W
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_MED, SF_SMALL
from tests.oracle_harness import duck_con


def test_countmin_never_underestimates_any_key(spark):
    """CMS one-sided error must hold for EVERY user, not only the
    declared top-10 — rebuild estimates for the full key space and
    assert min-of-rows >= exact everywhere."""
    events = spark.read.parquet(f"{SF_MED}/events.parquet")
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    h = per_user.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
    )
    buckets = h.select(
        "user_id",
        "exact_n",
        F.posexplode(
            F.array(
                *[
                    ((F.lit(a) * F.col("h") + F.lit(b)) % _CMS_P) % _CMS_W
                    for a, b in _CMS_AB
                ]
            )
        ).alias("j", "bucket"),
    )
    counters = buckets.groupBy("j", "bucket").agg(F.sum("exact_n").alias("cnt"))
    est = (
        buckets.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    assert est.filter(F.col("cms_n") < F.col("exact_n")).count() == 0


def test_bloom_members_always_hit(spark):
    """Bloom's one-sided contract: every exact member bloom-hits (no
    false negatives), per split, at both fixture SFs."""
    for sf in (SF_SMALL, SF_MED):
        rows = QUERIES["text_bloom_prefilter"](spark, sf).collect()
        assert rows, sf
        for r in rows:
            assert r.n_bloom_hits >= r.n_exact_members, (sf, r)
            assert r.n_false_pos == r.n_bloom_hits - r.n_exact_members, (sf, r)
        heldout = {r.split: r for r in rows}["heldout"]
        # every held-out doc is its own exact member and must hit
        assert heldout.n_bloom_hits == heldout.n_docs, heldout


def test_bottom_k_is_mergeable(spark):
    """Bottom-k of a union == bottom-k of the concatenated per-shard
    bottom-k's — the property that makes it the distributed reservoir.
    Split the corpus by doc_id parity, take k per shard, re-take k."""
    d = spark.read.parquet(f"{SF_MED}/documents.parquet").select(
        "lang", "doc_id", "n_chars"
    )
    rank = F.md5(F.col("doc_id").cast("string"))
    from pyspark.sql import Window

    def bottom_k(df, k=10):
        w = Window.partitionBy("lang").orderBy(rank, "doc_id")
        return (
            df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .drop("rk")
        )

    whole = bottom_k(d)
    shards = bottom_k(d.filter(F.col("doc_id") % 2 == 0)).unionAll(
        bottom_k(d.filter(F.col("doc_id") % 2 == 1))
    )
    merged = bottom_k(shards)
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_bottom_k_rank_stability_under_growth(spark):
    """Growth stability: adding new docs can evict boundary members but
    can never REORDER existing ones — the sf0.001 sample restricted to
    ids also present at sf0.001 keeps identical relative md5 order in
    the sf0.01 corpus (same ranks recomputed on the superset)."""
    small = QUERIES["sample_bottom_k"](spark, SF_SMALL).collect()
    with duck_con(SF_MED) as con:
        big = con.sql(
            """
            SELECT lang, doc_id,
                   row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents
            """
        ).fetchdf()
    big_rank = {(r.lang, r.doc_id): r.rk for r in big.itertuples()}
    by_lang: dict[str, list] = {}
    for r in sorted(small, key=lambda r: (r.lang, r.rk)):
        key = (r.lang, r.doc_id)
        if key in big_rank:
            by_lang.setdefault(r.lang, []).append(big_rank[key])
    for lang, ranks in by_lang.items():
        assert ranks == sorted(ranks), (lang, ranks)


def test_quality_filter_agrees_with_metric_tables(spark):
    """Cross-query consistency: the funnel's final survivor count must
    equal 'docs passing every threshold' recomputed from the DECLARED
    per-doc metric tables (text_quality + text_repetition_profile) using
    the shared QF_* constants — the executable form of the funnel's
    'cannot disagree with the metric tables' claim."""
    from paraslice_spark.operators.text import (
        QF_AWL_HI,
        QF_AWL_LO,
        QF_DBF_MAX,
        QF_MIN_WORDS,
        QF_SR_MIN,
    )

    q = QUERIES["text_quality"](spark, SF_SMALL)
    r = QUERIES["text_repetition_profile"](spark, SF_SMALL).select(
        "doc_id", "dup_bigram_frac"
    )
    survivors = (
        q.join(r, "doc_id")
        .where(
            (F.col("n_words") >= QF_MIN_WORDS)
            & (F.col("avg_word_len") >= QF_AWL_LO)
            & (F.col("avg_word_len") <= QF_AWL_HI)
            & (F.col("stopword_ratio") >= QF_SR_MIN)
            & (F.col("dup_bigram_frac") <= QF_DBF_MAX)
        )
        .count()
    )
    funnel = {
        row["stage"]: row
        for row in QUERIES["pipeline_quality_filter"](spark, SF_SMALL).collect()
    }
    assert funnel["4_repetition"]["n_pass"] == survivors
    # and the funnel is a real funnel: monotone n_in, every stage rejects
    order = ["1_min_words", "2_word_len", "3_stopword", "4_repetition"]
    for a, b in zip(order, order[1:]):
        assert funnel[b]["n_in"] == funnel[a]["n_pass"]
        assert funnel[a]["n_reject"] > 0
    assert funnel["4_repetition"]["n_reject"] > 0
