"""Round-11 feature tests: from-scratch third-engine references for the
new declared queries (the test_r10_features discipline — pure Python /
hashlib derivations that share NO code with either engine, so a formula
error in a hash-matching oracle pair still fails here)."""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL

_EPOCH = datetime.datetime(1970, 1, 1)


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _md5_hex(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def _split_label(doc_id: int) -> str:
    h = _md5_hex(doc_id)[0]
    return "train" if h < "c" else ("val" if h < "e" else "test")


# ---- events_retention_survivorship --------------------------------------


def retention_survivorship_python(
    rows: list[tuple[int, datetime.datetime]],
) -> list[tuple]:
    """(user_id, ts) -> the declared 5-column rows, from scratch."""
    act = {
        (u, int((ts - _EPOCH).total_seconds()) // 86400) for u, ts in rows
    }
    per_user: dict[int, list[int]] = {}
    for u, day in act:
        per_user.setdefault(u, []).append(day)
    c = {u: min(ds) for u, ds in per_user.items()}
    nd = {u: len(ds) for u, ds in per_user.items()}
    mn, mx = min(nd.values()), max(nd.values())
    band = {
        u: min(2, (v - mn) * 3 // (mx - mn + 1)) for u, v in nd.items()
    }
    cohort_n: dict[int, int] = {}
    for u in per_user:
        cohort_n[band[u]] = cohort_n.get(band[u], 0) + 1
    counts: dict[tuple[int, int], int] = {}
    for u, day in act:
        off = day - c[u]
        if 0 <= off <= 7:
            counts[(off, band[u])] = counts.get((off, band[u]), 0) + 1
    return [
        (off, b, cohort_n[b], n, n * 1_000_000 // cohort_n[b])
        for (off, b), n in sorted(counts.items())
    ]


def test_retention_survivorship_matches_python(spark):
    rows = _fetch(
        f"SELECT user_id, ts FROM '{SF_SMALL}/events.parquet'"
    )
    want = retention_survivorship_python(rows)
    got = [
        tuple(r)
        for r in QUERIES["events_retention_survivorship"](
            spark, SF_SMALL
        ).collect()
    ]
    assert got == want
    # non-vacuity (the docstring's finding): offset-0 retention is 1.0 in
    # every band (the conditioning leak), and at least one later offset
    # separates low from high band by > 5 ppt
    by_off: dict[int, dict[int, int]] = {}
    for off, b, _, _, ppm in got:
        by_off.setdefault(off, {})[b] = ppm
    assert all(p == 1_000_000 for p in by_off[0].values())
    assert any(
        bands.get(2, 0) - bands.get(0, 0) > 50_000
        for off, bands in by_off.items()
        if off > 0 and 0 in bands and 2 in bands
    ), got


# ---- sample_split_stability_audit ----------------------------------------


def split_stability_python(doc_ids: list[int]) -> list[tuple]:
    """doc_ids -> the declared transition rows, from scratch."""
    cutoff = max(doc_ids) * 4 // 5
    base = sorted(i for i in doc_ids if i <= cutoff)
    full = sorted(doc_ids)

    def ord_label(order: list[int]) -> dict[int, str]:
        n = len(order)
        out = {}
        for rn, i in enumerate(order, start=1):
            b8 = (rn - 1) * 8 // n
            out[i] = "train" if b8 < 6 else ("val" if b8 == 6 else "test")
        return out

    rows: dict[tuple[str, str, str], int] = {}
    for i in base:
        s = _split_label(i)
        rows[("hash", s, s)] = rows.get(("hash", s, s), 0) + 1
    lb, lf = ord_label(base), ord_label(full)
    for i in base:
        k = ("ordinal", lb[i], lf[i])
        rows[k] = rows.get(k, 0) + 1
    return [(m, a, b, n) for (m, a, b), n in sorted(rows.items())]


def test_split_stability_matches_python(spark):
    ids = [r[0] for r in _fetch(
        f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'"
    )]
    want = split_stability_python(ids)
    got = [
        tuple(r)
        for r in QUERIES["sample_split_stability_audit"](
            spark, SF_SMALL
        ).collect()
    ]
    assert got == want
    # non-vacuity: the hash method is move-free (diagonal only), the
    # ordinal method has at least one off-diagonal (a real move), and
    # every ordinal move lands in a LOWER-or-equal bucket (appends only
    # add higher ids, so percentiles only shrink)
    order = {"train": 0, "val": 1, "test": 2}
    assert all(a == b for m, a, b, _ in got if m == "hash")
    moves = [(a, b, n) for m, a, b, n in got if m == "ordinal" and a != b]
    assert moves, got
    assert all(order[b] <= order[a] for a, b, _ in moves), moves


# ---- pipeline_shard_balance_audit ----------------------------------------


def shard_balance_python(rows: list[tuple[int, str]]) -> list[tuple]:
    """(doc_id, lang) -> the declared per-lang balance rows."""
    cell: dict[tuple[str, str], int] = {}
    for doc_id, lang in rows:
        k = (_md5_hex(doc_id)[0], lang)
        cell[k] = cell.get(k, 0) + 1
    shards = sorted({s for s, _ in cell})
    langs = sorted({l for _, l in cell})
    n_shard = {
        s: sum(v for (ss, _), v in cell.items() if ss == s) for s in shards
    }
    n_lang = {
        l: sum(v for (_, ll), v in cell.items() if ll == l) for l in langs
    }
    n = sum(cell.values())
    out = []
    for l in langs:
        corpus_ppm = n_lang[l] * 1_000_000 // n
        shares = [
            cell.get((s, l), 0) * 1_000_000 // n_shard[s] for s in shards
        ]
        out.append(
            (
                l,
                corpus_ppm,
                len(shards),
                min(shares),
                max(shares),
                max(abs(sh - corpus_ppm) for sh in shares),
            )
        )
    return out


def test_shard_balance_matches_python(spark):
    rows = _fetch(
        f"SELECT doc_id, lang FROM '{SF_SMALL}/documents.parquet'"
    )
    want = shard_balance_python(rows)
    got = [
        tuple(r)
        for r in QUERIES["pipeline_shard_balance_audit"](
            spark, SF_SMALL
        ).collect()
    ]
    assert got == want
    # non-vacuity: real deviation exists (hash-sharding is sampling, not
    # magic), but no shard is wildly off (uniformity sanity: worst
    # deviation under 50 ppt at this shard size)
    assert all(r[5] > 0 for r in got)
    assert all(r[5] < 500_000 for r in got), got


# ---- stats_sample_error_sweep ---------------------------------------------


def sample_error_python(
    rows: list[tuple[int, float]], rates=(10_000, 50_000, 100_000, 250_000)
) -> list[tuple]:
    """(o_orderkey, o_totalprice) -> the declared 8-column sweep rows."""
    recs = [
        (
            int(_md5_hex(k)[:8], 16) % 1_000_000,
            int(math.floor(p * 100 + 0.5)),  # positive 2-dec money
        )
        for k, p in rows
    ]
    n_full = len(recs)
    mean_full = sum(c for _, c in recs) // n_full
    out = []
    for rate in rates:
        samp = [c for r, c in recs if r < rate]
        n_s = len(samp)
        est_rows = n_s * 1_000_000 // rate
        mean_s = sum(samp) // max(n_s, 1)
        out.append(
            (
                rate,
                n_s,
                est_rows,
                n_full,
                abs(est_rows - n_full) * 1_000_000 // n_full,
                mean_s,
                mean_full,
                abs(mean_s - mean_full) * 1_000_000 // mean_full,
            )
        )
    return out


def test_sample_error_sweep_matches_python(spark):
    rows = _fetch(
        f"SELECT o_orderkey, o_totalprice FROM '{SF_SMALL}/orders.parquet'"
    )
    want = sample_error_python(rows)
    got = [
        tuple(r)
        for r in QUERIES["stats_sample_error_sweep"](spark, SF_SMALL).collect()
    ]
    assert got == want
    # non-vacuity + sanity (the r10 events_overdispersion lesson: check
    # the VALUE regime, not just the cross-engine match): the mean error
    # at the largest rate is far inside the 1% small-sample error, and
    # every sampled count is plausible for its rate (within 5x)
    errs = {r[0]: r[7] for r in got}
    assert errs[250_000] < errs[10_000] or errs[10_000] == 0
    for rate, n_s, *_ in [(r[0], r[1]) for r in got]:
        expect = len(rows) * rate / 1_000_000
        assert n_s <= 5 * expect + 5, (rate, n_s, expect)


# ---- pipeline_pack_waste_sweep ---------------------------------------------


def pack_waste_python(
    docs: list[tuple[int, int]], ctxs=(256, 512, 1024, 2048)
) -> list[tuple]:
    """(doc_id, n_tokens) -> the declared 6-column sweep rows, from
    scratch (concat-then-split per md5-hex bucket, doc_id order)."""
    buckets: dict[str, list[tuple[int, int]]] = {}
    for doc_id, tok in docs:
        buckets.setdefault(_md5_hex(doc_id)[0], []).append((doc_id, tok))
    spans = []  # (start, tok) per doc, per its bucket stream
    totals = []
    for b, ds in buckets.items():
        off = 0
        for _, tok in sorted(ds):
            spans.append((off, tok))
            off += tok
        totals.append(off)
    out = []
    for ctx in ctxs:
        n_chunks = sum((t + ctx - 1) // ctx for t in totals)
        pad = sum((ctx - t % ctx) % ctx for t in totals)
        n_split = sum(1 for s, t in spans if s // ctx != (s + t - 1) // ctx)
        crossings = sum((s + t - 1) // ctx - s // ctx for s, t in spans)
        out.append(
            (ctx, n_chunks, pad, pad * 1_000_000 // (n_chunks * ctx),
             n_split, crossings)
        )
    return out


def test_pack_waste_sweep_matches_python(spark):
    rows = _fetch(
        "SELECT doc_id, len(string_split(text, ' ')) "
        f"FROM '{SF_SMALL}/documents.parquet'"
    )
    want = pack_waste_python(rows)
    got = [
        tuple(r)
        for r in QUERIES["pipeline_pack_waste_sweep"](spark, SF_SMALL).collect()
    ]
    assert got == want
    # non-vacuity + the measured tradeoff: padding share rises with ctx,
    # split docs fall; every ctx splits at least one doc on this fixture
    wastes = [r[3] for r in got]
    splits = [r[4] for r in got]
    assert wastes == sorted(wastes) and splits == sorted(splits, reverse=True)
    assert all(s > 0 for s in splits[:2]), got
