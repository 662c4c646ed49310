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


# ---- events_session_watermark_audit ------------------------------------

import hashlib

from paraslice_spark.operators.reshape import (
    EP_MAX_DELAY_S,
    EP_WM_DELAY_NS,
    EPISODE_GAP_NS,
)


def _md5u32(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def session_wm_python(rows: list[tuple[int, int, int]]) -> tuple:
    """From-scratch streaming replay of the session-watermark audit:
    rows are (event_id, user_id, ts_ns).  Arrival = bounded ingestion
    delay; watermark = running max event time among STRICTLY earlier
    arrivals; drop iff wm - delta >= ts + gap; then sessionize the full
    and surviving sets per user and compose the six declared metrics."""
    order = sorted(
        rows,
        key=lambda r: (
            r[2] + (_md5u32(r[0]) % EP_MAX_DELAY_S) * 1_000_000_000,
            r[0],
        ),
    )
    kept: dict[int, bool] = {}
    mx = None
    for eid, _uid, ts in order:
        kept[eid] = not (
            mx is not None and mx - EP_WM_DELAY_NS >= ts + EPISODE_GAP_NS
        )
        mx = ts if mx is None else max(mx, ts)
    by_user: dict[int, list] = {}
    for eid, uid, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    n_events, n_dropped = len(rows), sum(1 for v in kept.values() if not v)
    n_true = n_surv = n_lost = n_extra = 0
    for evs in by_user.values():
        evs.sort()
        sessions: list[list] = []
        prev = None
        for ts, eid in evs:
            if prev is None or ts - prev > EPISODE_GAP_NS:
                sessions.append([])
            sessions[-1].append((ts, eid))
            prev = ts
        for s in sessions:
            n_true += 1
            ks = [(ts, eid) for ts, eid in s if kept[eid]]
            if not ks:
                n_lost += 1
                continue
            frags, pk = 1, ks[0][0]
            for ts, _eid in ks[1:]:
                if ts - pk > EPISODE_GAP_NS:
                    frags += 1
                pk = ts
            n_surv += frags
            n_extra += frags - 1
    return (n_events, n_dropped, n_true, n_surv, n_lost, n_extra)


def test_session_watermark_audit_matches_python_replay(spark):
    rows = [
        (eid, uid, ts)
        for eid, uid, ts in _fetch(
            f"SELECT event_id, user_id, epoch_ns(ts) "
            f"FROM '{SF_SMALL}/events.parquet'"
        )
    ]
    want = session_wm_python(rows)
    r = QUERIES["events_session_watermark_audit"](spark, SF_SMALL).collect()
    assert len(r) == 1
    got = tuple(
        r[0][c]
        for c in (
            "n_events",
            "n_dropped",
            "n_sessions_true",
            "n_sessions_surv",
            "n_sessions_lost",
            "n_extra_fragments",
        )
    )
    assert got == want
    # non-vacuity (measured in the docstring): rows drop, whole episodes
    # die, AND surviving episodes fragment — the split/merge signal the
    # bounded-delay replay exists to surface (full permutation zeroes it)
    assert got[1] > 0 and got[4] > 0 and got[5] > 0
    # fragment nesting identity: surv = (true - lost) + extra
    assert got[3] == got[2] - got[4] + got[5]


# ---- stats_join_cardinality_audit ---------------------------------------


def join_card_python(
    li_keys: dict[str, list[int]], cust: list[int]
) -> list[tuple]:
    """From-scratch join-cardinality audit reference: per key column,
    exact self-join size, System-R n²/ndv, and the 10-bucket equi-width
    refinement — pure-Python integer arithmetic."""
    out = []
    cols = dict(li_keys)
    cols["o_custkey"] = cust
    for col in sorted(cols):
        cnt: dict[int, int] = {}
        for v in cols[col]:
            cnt[v] = cnt.get(v, 0) + 1
        n, ndv = sum(cnt.values()), len(cnt)
        exact = sum(c * c for c in cnt.values())
        mn, mx = min(cnt), max(cnt)
        bk: dict[int, list[int]] = {}
        for v, c in cnt.items():
            b = min(9, (v - mn) * 10 // (mx - mn + 1))
            e = bk.setdefault(b, [0, 0])
            e[0] += c
            e[1] += 1
        hist = sum(nb * nb // nd for nb, nd in bk.values())
        out.append(
            (
                col,
                n,
                ndv,
                exact,
                n * n // ndv,
                (exact - n * n // ndv) * 1_000_000 // exact,
                hist,
                (exact - hist) * 1_000_000 // exact,
            )
        )
    return out


def test_join_cardinality_audit_matches_python(spark):
    li = _fetch(
        f"SELECT l_partkey, l_suppkey FROM '{SF_SMALL}/lineitem.parquet'"
    )
    cust = [
        r[0]
        for r in _fetch(f"SELECT o_custkey FROM '{SF_SMALL}/orders.parquet'")
    ]
    want = join_card_python(
        {
            "l_partkey": [r[0] for r in li],
            "l_suppkey": [r[1] for r in li],
        },
        cust,
    )
    rows = QUERIES["stats_join_cardinality_audit"](spark, SF_SMALL).collect()
    got = sorted(tuple(r) for r in rows)
    assert got == want
    # non-vacuity: the behavioral key must show real underestimation
    by_col = {r[0]: r for r in got}
    assert by_col["o_custkey"][5] > 0 and by_col["o_custkey"][7] > 0


# ---- pipeline_release_diff ----------------------------------------------


def release_diff_python(docs: list[tuple[int, str]]) -> list[tuple]:
    """From-scratch release-diff reference over (doc_id, text) pairs:
    hashlib is the md5 engine for both the 2-digit shard rule and the
    per-doc content digests."""
    cutoff = max(d for d, _ in docs) * 4 // 5
    sh: dict[str, list[int]] = {}
    for did, text in docs:
        bucket = hashlib.md5(str(did).encode()).hexdigest()[:2]
        cd = int(
            hashlib.md5(
                hashlib.md5(text.encode()).hexdigest().encode()
            ).hexdigest()[:8],
            16,
        )
        e = sh.setdefault(bucket, [0, 0, 0, 0])  # n_base n_inc ck_base ck_full
        if did <= cutoff:
            e[0] += 1
            e[2] += cd
        else:
            e[1] += 1
        e[3] += cd
    agg: dict[str, list[int]] = {}
    for n_base, n_inc, ckb, ckf in sh.values():
        status = (
            "new" if n_base == 0 else ("changed" if ckf != ckb else "unchanged")
        )
        e = agg.setdefault(status, [0, 0, 0, 0])
        e[0] += 1
        e[1] += n_base
        e[2] += n_inc
        e[3] += ckf - ckb
    return [(s, *v) for s, v in sorted(agg.items())]


def test_release_diff_matches_python(spark):
    docs = _fetch(f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'")
    want = release_diff_python(docs)
    rows = QUERIES["pipeline_release_diff"](spark, SF_SMALL).collect()
    got = sorted(tuple(r) for r in rows)
    assert got == want
    by = {r[0]: r for r in got}
    # all three classes live at this SF (measured in the docstring), and
    # the unchanged class is delta-0 structurally (appends only add)
    assert set(by) == {"changed", "new", "unchanged"}
    assert by["unchanged"][3] == 0 and by["unchanged"][4] == 0
    assert by["new"][2] == 0 and by["changed"][4] > 0


# ---- dedup_survivorship_bias --------------------------------------------


def survivorship_python(docs: list[tuple[int, str]]) -> list[tuple]:
    """From-scratch survivorship reference: hashlib fingerprints over
    sorted distinct words, 5 equi-width length bands, first-wins."""
    rows = []
    for did, text in docs:
        words = text.split(" ")
        fp = hashlib.md5(
            " ".join(sorted(set(words))).encode()
        ).hexdigest()
        rows.append((did, fp, len(words)))
    mn = min(w for _d, _f, w in rows)
    mx = max(w for _d, _f, w in rows)
    band = {d: min(4, (w - mn) * 5 // (mx - mn + 1)) for d, _f, w in rows}
    winner: dict[str, int] = {}
    for d, fp, _w in rows:
        if fp not in winner or d < winner[fp]:
            winner[fp] = d
    agg: dict[int, list[int]] = {}
    for d, fp, _w in rows:
        b = band[d]
        e = agg.setdefault(b, [0, 0, 0, 0])
        e[0] += 1
        if d == winner[fp]:
            e[1] += 1
        else:
            e[2] += 1
            if band[winner[fp]] != b:
                e[3] += 1
    return [
        (b, n, k, dr, k * 1_000_000 // n, xb)
        for b, (n, k, dr, xb) in sorted(agg.items())
    ]


def test_survivorship_bias_matches_python(spark):
    docs = _fetch(f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'")
    want = survivorship_python(docs)
    rows = QUERIES["dedup_survivorship_bias"](spark, SF_SMALL).collect()
    got = sorted(tuple(r) for r in rows)
    assert got == want
    # the measured finding: survival declines with length, and
    # cross-band evictions exist — the bias the audit exists to surface
    ppm = [r[4] for r in got]
    assert ppm[0] > ppm[-1]
    assert sum(r[5] for r in got) > 0


# ---- agg_kmv_intersection_error -----------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_KMV_K = 64


def kmv_intersection_python(
    pairs: list[tuple[str, int]], priorities=_PRIORITIES
) -> list[tuple]:
    """From-scratch KMV set-algebra reference over (priority, custkey)
    rows: hashlib bottom-k of the union, overlap fraction of the k
    minima, stated integer operation order."""
    members: dict[str, set[int]] = {t: set() for t in priorities}
    for t, c in pairs:
        members[t].add(c)
    out = []
    for i, a in enumerate(priorities):
        for b in priorities[i + 1:]:
            union = members[a] | members[b]
            if not union:
                continue  # SQL emits no row for an empty pair frame
            inter = members[a] & members[b]
            ranked = sorted((_md5u32(c), c) for c in union)
            exact = len(inter)
            if len(ranked) < _KMV_K:
                est = exact
                err = 0
            else:
                vk = ranked[_KMV_K - 1][0]
                cnt_both = sum(
                    1 for _h, c in ranked[:_KMV_K] if c in inter
                )
                est = ((_KMV_K - 1) * 4294967296 // vk) * cnt_both // _KMV_K
                err = est - exact
            out.append((f"{a}|{b}", exact, est, err))
    return sorted(out)


def test_kmv_intersection_matches_python(spark):
    rows = _fetch(
        f"SELECT DISTINCT o_orderpriority, o_custkey "
        f"FROM '{SF_SMALL}/orders.parquet'"
    )
    want = kmv_intersection_python([(t, c) for t, c in rows])
    got = sorted(
        tuple(r)
        for r in QUERIES["agg_kmv_intersection_error"](
            spark, SF_SMALL
        ).collect()
    )
    assert got == want
    # the set-algebra core is live on the fixture: every pair's overlap
    # is PARTIAL (0 < exact < min side), and the estimator branch ran
    # (populations >= k, so at least one pair carries nonzero error)
    assert all(r[1] > 0 for r in got)
    assert any(r[3] != 0 for r in got)


# ---- cross-query consistency ---------------------------------------------


def test_release_diff_consistent_with_manifest_and_corpus(spark):
    """Cross-query ledger identities: the release diff's doc totals must
    re-add to the corpus size, and agree with the shard manifest's own
    doc total (1-digit and 2-digit shardings partition the SAME corpus)."""
    n_docs = _fetch(
        f"SELECT COUNT(*) FROM '{SF_SMALL}/documents.parquet'"
    )[0][0]
    diff = QUERIES["pipeline_release_diff"](spark, SF_SMALL).collect()
    assert sum(r["docs_base"] + r["docs_added"] for r in diff) == n_docs
    man = QUERIES["pipeline_shard_manifest"](spark, SF_SMALL).collect()
    assert sum(r["n_docs"] for r in man) == n_docs
