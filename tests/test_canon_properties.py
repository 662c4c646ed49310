"""Hypothesis property tests for the canonicalization layer (SURVEY §5.3).

These pin the *math* that the oracle-diff tests rely on: the cents/micros
int64 encodings must round-trip 2-decimal values exactly and must agree
with DuckDB's evaluation of the twin SQL expression for arbitrary doubles.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.decimals(
        min_value=-99_999_999, max_value=99_999_999, places=2, allow_nan=False
    )
)
@settings(max_examples=300, deadline=None)
def test_cents_roundtrip_exact_for_2dec(d):
    """round(x*100) as int64 is lossless for any 2-decimal money value."""
    x = float(d)
    cents = int(np.round(x * 100))
    assert cents / 100.0 == x


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False))
@settings(max_examples=200, deadline=None)
def test_micros_units_agree_with_duckdb(x):
    """CAST(round(x*1e6) AS BIGINT) must produce the same int64 in numpy
    (Spark's double path) and DuckDB for arbitrary doubles — this is the
    exact expression pair used in oracles."""
    py = int(np.round(np.float64(x) * 1000000))
    with duckdb.connect() as con:
        db = con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE) * 1000000) AS BIGINT)", [x]
        ).fetchone()[0]
    # numpy round is banker's; DuckDB round is half-away — they may differ
    # ONLY when x*1e6 lands exactly on .5, which is measure-zero for data
    # doubles but reachable by hypothesis: tolerate that single-ULP case.
    if abs(py - db) not in (0, 1):
        raise AssertionError((x, py, db))
    if py != db:
        frac = abs(np.float64(x) * 1000000) % 1
        assert frac == 0.5, (x, py, db)


@given(
    st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=50,
    ),
    st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=100, deadline=None)
def test_window_percentile_formula_matches_numpy(values, p):
    """The sort-window interpolation in agg_percentile implements the
    type-7 quantile — identical to numpy's default (linear)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = len(v)
    h = (n - 1) * p
    lo, hi = int(np.floor(h)), int(np.ceil(h))
    ours = v[lo] + (h - lo) * (v[hi] - v[lo])
    ref = np.quantile(np.asarray(values), p)
    assert abs(ours - ref) <= 1e-9 * max(1.0, abs(ref))


def test_phash_band_pigeonhole_invariant():
    """Exhaustiveness proof-by-property for the phash banding: ANY two
    60-bit hashes within hamming <= 3 share at least one of the 4 15-bit
    bands (pigeonhole: 3 differing bits cannot touch 4 bands), so band
    blocking loses no qualifying pair."""
    import random

    from paraslice_spark.operators.multimodal import _PH_BANDS, _PH_BITS, _PH_HAM

    rng = random.Random(1234)
    for _ in range(2000):
        h = rng.getrandbits(_PH_BITS)
        flips = rng.sample(range(_PH_BITS), rng.randint(0, _PH_HAM))
        h2 = h
        for b in flips:
            h2 ^= 1 << b
        bands = [
            ((h >> (15 * j)) & 0x7FFF, (h2 >> (15 * j)) & 0x7FFF)
            for j in range(_PH_BANDS)
        ]
        assert any(a == b for a, b in bands), (h, h2, flips)


def test_fixture_assumption_canaries(spark):
    """Assumptions the oracles LEAN ON, asserted against the live fixture so
    a testdata regeneration that breaks one fails HERE with a named reason
    instead of as a pile of opaque hash mismatches (the r3/r4 lesson):

    - documents.text is pure ASCII: the multimodal ascii-twin oracles
      (feature_extract, phash) equate byte i with code point of char i.
    - money columns are exactly 2-decimal: cents() int64 round-trip.
    - l_quantity is integer-valued in [1, 50]: q18/q20 sums cast
      losslessly to BIGINT and audit ranges hold.
    - embeddings are 64-dim with |x| < 4: micro-unit dot products stay
      far below 2^53 (signlsh/pagerank/gram exactness bound).
    """
    from pyspark.sql import functions as F

    from paraslice_spark.sources.io import load_tables
    from tests.conftest import SF_SMALL

    t = load_tables(spark, SF_SMALL)

    max_cp = t["documents"].select(
        F.max(F.aggregate(
            F.transform(F.split("text", ""), lambda c: F.ascii(c)),
            F.lit(0), lambda a, x: F.greatest(a, x),
        )).alias("m")
    ).first()["m"]
    assert max_cp < 128, f"documents.text not pure ASCII (max cp {max_cp})"

    for tbl, col in (("lineitem", "l_extendedprice"), ("orders", "o_totalprice"),
                     ("customer", "c_acctbal"), ("part", "p_retailprice")):
        bad = t[tbl].where(
            F.abs(F.col(col) * 100 - F.round(F.col(col) * 100)) > 1e-6
        ).count()
        assert bad == 0, f"{tbl}.{col} not 2-decimal ({bad} rows)"

    q = t["lineitem"].select(
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi"),
        F.max(F.abs(F.col("l_quantity") - F.round("l_quantity"))).alias("frac"),
    ).first()
    assert q["lo"] >= 1 and q["hi"] <= 50 and q["frac"] == 0.0, q

    e = t["embeddings"].select(
        F.max(F.size("embedding")).alias("dim"),
        F.max(F.aggregate(
            F.transform("embedding", lambda x: F.abs(x.cast("double"))),
            F.lit(0.0), lambda a, x: F.greatest(a, x),
        )).alias("mx"),
    ).first()
    assert e["dim"] == 64 and e["mx"] < 4.0, e

    # every document has >= 3 words: the n-gram oracles (boilerplate
    # trigrams, PMI bigrams, shingles) produce non-degenerate grams for
    # every doc.  The Spark side is clamped (ADVICE r6) so a short doc
    # would not crash — but a regeneration shrinking docs below 3 words
    # should still fail HERE with a named reason, not as gram-count
    # drift.
    wmin = t["documents"].select(
        F.min(F.size(F.split("text", " "))).alias("w")
    ).first()["w"]
    assert wmin >= 3, f"documents shorter than 3 words (min {wmin})"


@given(
    st.lists(
        st.integers(min_value=1, max_value=600),  # token counts
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=0, max_value=199),  # append split point
)
@settings(max_examples=200, deadline=None)
def test_sequence_pack_model_is_append_stable(toks, cut):
    """pipeline_sequence_pack's chunk formula (start-offset // 512 over a
    per-bucket doc_id-ordered running sum) must be APPEND-STABLE: in an
    append-only ingest doc_ids are monotone, so new docs sort after every
    existing doc in their bucket and can never move an existing doc's
    chunk — the docstring's 'incremental re-ingest repacks only touched
    shards' claim. Pure-python model of the exact SQL formula (the
    cross-engine formula itself is hash-verified by the oracle)."""
    import hashlib

    cut = min(cut, len(toks))

    def assign(items):  # [(doc_id, tok)] -> {doc_id: (bucket, chunk)}
        out = {}
        by_bucket: dict[str, int] = {}
        for doc_id, tok in items:  # items already doc_id-ordered
            b = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
            start = by_bucket.get(b, 0)
            out[doc_id] = (b, start // 512)
            by_bucket[b] = start + tok
        return out

    items = list(enumerate(toks))  # doc_id = position -> monotone append
    full = assign(items)
    prefix = assign(items[:cut])
    for doc_id, assignment in prefix.items():
        assert full[doc_id] == assignment


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_split_label_agrees_with_duckdb(doc_id):
    """canon.split_label (Python md5 twin) and canon.SPLIT_LABEL_SQL must
    assign the same train/val/test label to any doc_id — the single
    source of truth every split consumer (sample_split_train_val_test,
    pipeline_token_budget, pipeline_dataset_build, text_bloom_prefilter
    via HELDOUT) now shares."""
    import hashlib

    from paraslice_spark.functions.canon import (
        SPLIT_LABEL_SQL,
        SPLIT_TEST_DIGIT,
        SPLIT_VAL_DIGIT,
    )

    h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
    py = (
        "train"
        if h < SPLIT_VAL_DIGIT
        else ("val" if h < SPLIT_TEST_DIGIT else "test")
    )
    with duckdb.connect() as con:
        db = con.execute(
            f"SELECT {SPLIT_LABEL_SQL} FROM (SELECT CAST(? AS BIGINT) AS doc_id)",
            [doc_id],
        ).fetchone()[0]
    assert py == db, (doc_id, h, py, db)


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=120, deadline=None)
def test_doc_chunk_rule_matches_python_for_any_length(n_words, seed):
    """The W/S chunk rule (starts 1, 1+S, ... <= n; width min(W, n-s+1))
    as evaluated by the ORACLE's DuckDB expressions must equal a pure
    Python chunker for arbitrary word counts — the boundary cases (n < W,
    n = k*S, n = k*S+1, short tails) are exactly where a slice clamp
    could diverge."""
    from paraslice_spark.operators.text import CHUNK_S, CHUNK_W

    words = [f"w{seed}_{i}" for i in range(n_words)]
    text = " ".join(words)
    expect = []
    for k, start in enumerate(range(0, n_words, CHUNK_S)):
        chunk = words[start : start + CHUNK_W]
        expect.append((k + 1, start + 1, len(chunk)))
    with duckdb.connect() as con:
        got = con.execute(
            f"""
            WITH w AS (SELECT string_split(?, ' ') AS words),
            s AS (SELECT words, len(words) AS n,
                         unnest(range(1, len(words) + 1, {CHUNK_S}))
                           AS start_word
                  FROM w)
            SELECT (start_word - 1) // {CHUNK_S} + 1,
                   start_word,
                   len(list_slice(words, start_word,
                                  start_word + {CHUNK_W} - 1))
            FROM s ORDER BY 2
            """,
            [text],
        ).fetchall()
    assert [tuple(r) for r in got] == expect
