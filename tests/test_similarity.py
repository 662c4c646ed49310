"""Property tests for near-dup pipelines: recall/precision vs brute-force
ground truth, with planted near-duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from paraslice_spark.operators.similarity import minhash_near_dup_pairs, shingle_docs
from paraslice_spark.sources.io import load_tables
from tests.conftest import SF_SMALL


def _brute_force_pairs(docs, threshold=0.8):
    """Ground truth: exact shingle-Jaccard over the full cross product."""
    sh = shingle_docs(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(inter / union >= threshold)
        .collect()
    }


def _planted(spark):
    """20 fixture docs + 3 near-duplicate copies (one word appended)."""
    base = (
        load_tables(spark, SF_SMALL)["documents"]
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(20)
    )
    dups = base.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extrat")).alias("text"),
    )
    return base.unionByName(dups)


def test_minhash_matches_brute_force_on_planted(spark):
    docs = _planted(spark).cache()
    got = {(r["doc_a"], r["doc_b"]) for r in minhash_near_dup_pairs(docs, 0.8).collect()}
    want = _brute_force_pairs(docs, 0.8)
    assert {(0, 10000), (1, 10001), (2, 10002)} <= want  # plants are real dups
    # exact-verify step ⇒ precision 1.0; banded LSH ⇒ recall vs ground truth
    assert got <= want
    assert len(got) >= len(want) - 0, (got, want)  # full recall on this corpus


def test_embedding_neardup_finds_planted_pairs(spark):
    from paraslice_spark.operators.similarity import embedding_near_dup_pairs

    base = load_tables(spark, SF_SMALL)["embeddings"].limit(50).cache()
    # plant 5 exact-duplicate vectors under new ids (cos = 1.0)
    dups = base.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    emb = base.unionByName(dups)
    pairs = {(r["vec_a"], r["vec_b"]) for r in embedding_near_dup_pairs(emb, 0.9).collect()}
    assert {(i, i + 10000) for i in range(5)} <= pairs, pairs
    # random 64-dim vectors are near-orthogonal: no spurious cos>=0.9 pairs
    assert pairs == {(i, i + 10000) for i in range(5)}, pairs


def test_minhash_matches_brute_force_on_fixtures(spark):
    docs = load_tables(spark, SF_SMALL)["documents"].cache()
    got = {(r["doc_a"], r["doc_b"]) for r in minhash_near_dup_pairs(docs, 0.8).collect()}
    want = _brute_force_pairs(docs, 0.8)
    assert got == want, (got ^ want)
