"""Round-10 feature tests: from-scratch third-engine references for the
new declared queries (the test_r9_features discipline — pure Python /
hashlib / numpy derivations that share NO code with either engine, so a
formula error in a hash-matching oracle pair still fails here)."""

from __future__ import annotations

import math

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL

_QA_DIMS = 8
_QA_OFF = 16_000_000


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _mic(x: float) -> int:
    """Half-away-from-zero micro quantization — both engines' round()."""
    return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)


def qa_python(vecs: list[tuple[int, list[float]]]) -> tuple:
    """From-scratch quantizer-append-audit reference: pure-Python integer
    arithmetic over (vec_id, embedding) pairs, mirroring the DECLARED
    contract (not either engine's SQL)."""
    m = {vid: [_mic(x) for x in emb[:_QA_DIMS]] for vid, emb in vecs}
    cutoff = max(vid for vid, _ in vecs) * 4 // 5
    base_ids = [vid for vid, _ in vecs if vid <= cutoff]
    n_b, n_f = len(base_ids), len(vecs)
    sb = [sum(m[v][d] for v in base_ids) for d in range(_QA_DIMS)]
    sf = [sum(mv[d] for mv in m.values()) for d in range(_QA_DIMS)]

    def cell(mv, n, s):
        return sum(
            (1 << d) for d in range(_QA_DIMS) if mv[d] * n > s[d]
        )

    occ: dict[int, list[int]] = {}
    moved = 0
    for vid, _ in vecs:
        cb = cell(m[vid], n_b, sb)
        cf = cell(m[vid], n_f, sf)
        entry = occ.setdefault(cb, [0, 0])
        if vid <= cutoff:
            entry[0] += 1
            if cb != cf:
                moved += 1
        else:
            entry[1] += 1
    cells_base = sum(1 for nb, _ in occ.values() if nb > 0)
    cells_after = len(occ)
    inc_into_existing = sum(ni for nb, ni in occ.values() if nb > 0)
    shift = max(
        abs(
            (sf[d] + n_f * _QA_OFF) // n_f
            - (sb[d] + n_b * _QA_OFF) // n_b
        )
        for d in range(_QA_DIMS)
    )
    return (
        n_b,
        n_f - n_b,
        moved,
        moved * 1_000_000 // n_b,
        shift,
        cells_base,
        cells_after,
        cells_after - cells_base,
        inc_into_existing,
    )


def test_quantizer_append_audit_matches_python(spark):
    vecs = [
        (vid, list(emb))
        for vid, emb in _fetch(
            f"SELECT vec_id, CAST(embedding AS DOUBLE[]) "
            f"FROM '{SF_SMALL}/embeddings.parquet'"
        )
    ]
    want = qa_python(vecs)
    r = QUERIES["similarity_quantizer_append_audit"](
        spark, SF_SMALL
    ).collect()
    assert len(r) == 1
    got = tuple(
        r[0][c]
        for c in (
            "n_base",
            "n_inc",
            "n_base_moved",
            "moved_ppm",
            "max_mean_shift_micro",
            "cells_base",
            "cells_after",
            "cells_created",
            "inc_into_existing",
        )
    )
    assert got == want
    # non-vacuity (measured in the docstring): the append both opens new
    # cells / lands in existing ones AND would move base assignments on
    # retrain — the two signals the audit exists to report
    assert got[2] > 0 and got[8] > 0 and got[4] > 0
