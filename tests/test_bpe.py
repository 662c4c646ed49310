"""Property tests for the iterative BPE merge loop (text.bpe_train_merges).

text_bpe_pairs' oracle proves iteration-1 candidates cross-engine; these
prove the LOOP's invariants — the things a tokenizer trainer must not
violate regardless of corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paraslice_spark.operators.text import bpe_train_merges
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def trained(spark):
    merges, vocab = bpe_train_merges(spark, SF_SMALL, n_merges=5)
    return merges, vocab.collect()


def test_first_merge_matches_declared_candidates(spark, trained):
    """Iteration 1 of the loop must pick exactly the top row of the
    declared text_bpe_pairs table (freq DESC, pair ASC tie-break)."""
    merges, _ = trained
    top = QUERIES["text_bpe_pairs"](spark, SF_SMALL).first()
    assert merges[0].replace(" ", "") == top["pair"]


def test_merges_are_distinct_and_deterministic(spark, trained):
    merges, _ = trained
    assert len(merges) == 5
    assert len(set(merges)) == 5
    # determinism: a second training run picks identical merges
    merges2, _ = bpe_train_merges(spark, SF_SMALL, n_merges=2)
    assert merges2 == merges[:2]


def test_tokenization_reconstructs_every_word(trained):
    """Merges only ever concatenate adjacent tokens — joining a word's
    tokens must reproduce the word exactly."""
    _, rows = trained
    assert rows
    for r in rows:
        assert r.toks.replace(" ", "") == r.word, r


def test_merged_pair_no_longer_adjacent(trained):
    """After merging (a, b), tokens a and b can never be adjacent again
    (greedy left-to-right consumes every occurrence) — for EVERY merge
    in the history, since later merges only grow tokens."""
    merges, rows = trained
    for m in merges:
        a, b = m.split(" ")
        for r in rows:
            toks = r.toks.split(" ")
            for i in range(len(toks) - 1):
                assert not (toks[i] == a and toks[i + 1] == b), (m, r.word)


def test_token_count_strictly_decreases(spark, trained):
    """Each merge with a positive-frequency pair strictly reduces the
    corpus-weighted token count (by exactly its occurrence count)."""
    _, rows = trained
    final_tokens = sum(len(r.toks.split(" ")) * r.n for r in rows)
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    base_tokens = (
        d.select(
            F.sum(
                F.aggregate(
                    F.transform(
                        F.split("text", " "), lambda w: F.length(w)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
            ).alias("s")
        ).first()["s"]
    )
    assert final_tokens < base_tokens
