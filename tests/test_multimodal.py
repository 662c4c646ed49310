"""Planted-perturbation tests for the perceptual-hash dedup operator."""

from __future__ import annotations

from paraslice_spark.sources.io import load_tables
from tests.conftest import SF_SMALL


def test_phash_pairs_planted_perturbations(spark):
    """Hamming 1-3 band of the phash dedup: a copy with ONE flipped pixel
    relation lands at hamming 1-2 and must pair with its source through
    band blocking; a heavily scrambled copy must not."""
    from paraslice_spark.operators.multimodal import phash_pairs, with_media_column

    docs = load_tables(spark, SF_SMALL)["documents"].limit(20)
    media = with_media_column(docs)
    rows = media.collect()
    planted = []
    for r in rows[:3]:
        buf = bytearray(r["media"])
        # swap two adjacent payload bytes -> flips at most 3 dHash bits
        buf[10], buf[11] = buf[11], buf[10]
        planted.append((r["media_id"] + 10000, bytes(buf), r["meta"]))
    scrambled = []
    for r in rows[:3]:
        buf = bytearray(r["media"])
        for i in range(8, 8 + 61):  # reverse the whole pixel window
            buf[i] = r["media"][8 + 60 - (i - 8)]
        scrambled.append((r["media_id"] + 20000, bytes(buf), r["meta"]))
    extra = spark.createDataFrame(planted + scrambled, media.schema)
    pairs = phash_pairs(media.unionByName(extra))
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in pairs.collect()}
    for r in rows[:3]:
        mid = r["media_id"]
        assert (mid, mid + 10000) in got, got
        assert 0 < got[(mid, mid + 10000)] <= 3, got
        assert (mid, mid + 20000) not in got, got
