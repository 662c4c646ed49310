"""Round-12 oracle fuzz: from-scratch third-engine rederivations of the
oracles added/changed this round, on RANDOM tables (the house bar — an
oracle must be right because its math is right, not because it happens to
match the fixture).

LPA: the graph_lpa_communities oracle (3 unrolled mode-label rounds over
the _KNN_ORACLE edge spec) is rederived in pure Python on dyadic-rational
vectors — exact float64 dots (no summation-order hazard), rounded-cosine
ranking with neighbor_id ties, symmetrized-distinct edges, the
count-DESC/label-ASC mode tie-break, and the size-of-sizes histogram.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


def _rnd(x: float, n: int) -> float:
    # ROUND half-away-from-zero, matching Spark/DuckDB (CLAUDE.md trap:
    # Python round() is banker's and diverges on exactly-dyadic ratios)
    p = 10**n
    return math.floor(abs(x) * p + 0.5) / p * (1 if x >= 0 else -1)


@pytest.mark.parametrize("seed", range(6))
def test_lpa_communities_oracle_on_random_tables(seed):
    """graph_lpa_communities (hash-oracled r12, VERDICT r11 #3): kNN
    edges + 3 synchronous mode-label rounds + community-size histogram,
    all rederived from scratch."""
    rng = random.Random(15_000 + seed)
    dim = 8
    vecs = []
    for vid in range(rng.randrange(15, 45)):
        k = [rng.randrange(-64, 65) for _ in range(dim)]
        if not any(k):
            k[0] = 1  # no zero vectors (cosine undefined)
        vecs.append((vid, k))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(vid, [x / 64.0 for x in k]) for vid, k in vecs],
    )
    got = con.execute(ORACLES["graph_lpa_communities"]).fetchall()

    # exact dyadic kNN (the _KNN_ORACLE spec): rounded cosine DESC,
    # neighbor_id ASC, top 3 per vector
    norm2 = {vid: sum(x * x for x in k) for vid, k in vecs}
    adj: dict[int, set[int]] = {}
    for vid, k in vecs:
        scored = []
        for wid, m in vecs:
            if wid == vid:
                continue
            dot = sum(a * b for a, b in zip(k, m))
            cos = _rnd(
                (dot / 4096.0)
                / (
                    math.sqrt(norm2[vid] / 4096.0)
                    * math.sqrt(norm2[wid] / 4096.0)
                ),
                6,
            )
            scored.append((-cos, wid))
        for _c, wid in sorted(scored)[:3]:
            # symmetrize-then-distinct: both directions exist afterwards
            adj.setdefault(vid, set()).add(wid)
            adj.setdefault(wid, set()).add(vid)

    # 3 synchronous mode rounds, tie-break (count DESC, label ASC)
    labels = {node: node for node in adj}
    for _ in range(3):
        labels = {
            node: min(
                Counter(labels[nbr] for nbr in nbrs).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for node, nbrs in adj.items()
        }
    sizes = Counter(Counter(labels.values()).values())
    want = sorted((size, n, size * n) for size, n in sizes.items())
    assert got == want, seed
    # non-vacuity: propagation must have actually merged something
    assert any(size > 1 for size, _n, _t in want), seed


@pytest.mark.parametrize("seed", range(6))
def test_signlsh_band_sweep_oracle_on_random_tables(seed):
    """similarity_signlsh_band_sweep (r12 tier-0): micro-unit plane signs,
    per-width bucket packing, band-collision candidates, exact rounded-
    cosine top-5 truth, and every integer division — rederived from
    scratch on dyadic-rational 64-dim vectors (x = k/64 ⇒ mv = 15625·k
    exactly; 64-dim micro dots ≤ 6.4e13 < 2^53, so every engine sums
    exact integers)."""
    from paraslice_spark.operators.similarity import (
        _N_QUERIES,
        _SL_PLANES,
        _SL_SWEEP,
        _TOP_K,
    )

    rng = random.Random(16_000 + seed)
    dim = 64
    vecs = []
    for vid in range(rng.randrange(12, 40)):
        k = [rng.randrange(-64, 65) for _ in range(dim)]
        if not any(k):
            k[0] = 1
        vecs.append((vid, k))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(vid, [x / 64.0 for x in k]) for vid, k in vecs],
    )
    got = con.execute(ORACLES["similarity_signlsh_band_sweep"]).fetchall()

    # from-scratch model: mv is exactly 15625*k, bits are strict dot signs
    mv = {vid: [x * 15625 for x in k] for vid, k in vecs}
    bits = {
        vid: [
            1 if sum(a * b for a, b in zip(m, p)) > 0 else 0
            for p in _SL_PLANES
        ]
        for vid, m in mv.items()
    }

    def buckets(vid, w, nb):
        return [
            sum(bits[vid][b * w + j] << j for j in range(w)) for b in range(nb)
        ]

    # exact truth: rounded cosine DESC, neighbor_id ASC, top 5 per query
    sd = {vid: sum(x * x for x in m) for vid, m in mv.items()}
    truth = set()
    n_truth = 0
    qids = set()
    for qid, qm in mv.items():
        if qid >= _N_QUERIES:
            continue
        scored = []
        for cid, cm in mv.items():
            if cid == qid:
                continue
            dot = sum(a * b for a, b in zip(qm, cm))
            cos = _rnd(dot / (math.sqrt(sd[qid]) * math.sqrt(sd[cid])), 6)
            scored.append((-cos, cid))
        top = sorted(scored)[:_TOP_K]
        for _c, cid in top:
            truth.add((qid, cid))
        n_truth += len(top)
        if top:
            qids.add(qid)
    nq = len(qids)

    want = []
    for w, nb in _SL_SWEEP:
        cand = set()
        for qid in mv:
            if qid >= _N_QUERIES:
                continue
            qb = buckets(qid, w, nb)
            for cid in mv:
                if cid == qid:
                    continue
                cb = buckets(cid, w, nb)
                if any(a == b for a, b in zip(qb, cb)):
                    cand.add((qid, cid))
        hits = len(cand & truth)
        want.append(
            (
                w,
                nb,
                len(cand),
                nq,
                n_truth,
                hits,
                hits * 1_000_000 // max(n_truth, 1),
                len(cand) // max(nq, 1),
            )
        )
    assert got == sorted(want), seed
    # non-vacuity: the permissive arm must generate candidates and the
    # sweep must separate the arms (monotone candidate counts)
    counts = [row[2] for row in sorted(want)]
    assert counts[0] > 0 and counts[0] >= counts[1] >= counts[2], seed


@pytest.mark.parametrize("seed", range(6))
def test_repetition_cap_sweep_oracle_on_random_tables(seed):
    """text_repetition_cap_sweep (r12 tier-0): dup-bigram fraction →
    micro-unit lift → conditional cap counts → integer retention ppm,
    rederived from scratch on random small-vocab corpora (duplicate
    bigrams guaranteed), including sub-2-word docs whose NULL fraction
    every cap must reject."""
    from paraslice_spark.operators.text import _DBF_CAPS_PPM

    rng = random.Random(17_000 + seed)
    vocab = [f"w{i}" for i in range(rng.randrange(3, 9))]
    docs = []
    for did in range(rng.randrange(20, 60)):
        n = rng.choice((1, 2, rng.randrange(2, 40)))  # force degenerate docs
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(n))))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = con.execute(ORACLES["text_repetition_cap_sweep"]).fetchall()

    stats = []  # (n_words, dmic-or-None)
    for _did, text in docs:
        words = text.split(" ")
        nw = len(words)
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        if not bigrams:
            stats.append((nw, None))
            continue
        dbf = _rnd((len(bigrams) - len(set(bigrams))) / len(bigrams), 6)
        stats.append((nw, int(_rnd(dbf * 1_000_000, 0))))
    n_docs = len(stats)
    tok_total = sum(nw for nw, _ in stats)
    want = []
    for cap in _DBF_CAPS_PPM:
        kept = [(nw, d) for nw, d in stats if d is not None and d <= cap]
        nk = len(kept)
        tk = sum(nw for nw, _ in kept)
        want.append(
            (cap, nk, n_docs, nk * 1_000_000 // max(n_docs, 1),
             tk, tok_total, tk * 1_000_000 // max(tok_total, 1))
        )
    assert got == want, seed
    # non-vacuity: retention must be monotone in the cap and not flat
    keeps = [w[1] for w in want]
    assert keeps == sorted(keeps) and keeps[0] < n_docs, seed


@pytest.mark.parametrize("seed", range(6))
def test_decontaminate_gram_sweep_oracle_on_random_tables(seed):
    """text_decontaminate_gram_sweep (r12 tier-0): per-size distinct word
    n-grams, the >=half-containment flag, and all four count columns
    rederived from scratch on random small-vocab corpora with a planted
    bench/train near-dup (so the long-gram arms stay non-vacuous)."""
    from paraslice_spark.operators.text import _DECON_GRAM_NS

    rng = random.Random(18_000 + seed)
    vocab = [f"w{i}" for i in range(rng.randrange(4, 10))]
    docs = []
    for did in range(rng.randrange(15, 40)):
        src = "src0" if rng.random() < 0.3 else f"src{rng.randrange(1, 4)}"
        n = rng.choice((1, rng.randrange(2, 30)))
        docs.append((did, src, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant a cross-source near-dup: a train doc containing a bench doc
    bench_docs = [d for d in docs if d[1] == "src0" and len(d[2].split()) > 10]
    if bench_docs:
        bid, _src, btext = bench_docs[0]
        docs.append((10_000, "src1", btext + " " + vocab[0]))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    got = con.execute(ORACLES["text_decontaminate_gram_sweep"]).fetchall()

    def grams(text, n):
        words = text.split(" ")
        return {
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        }

    want = []
    for n in _DECON_GRAM_NS:
        bench = {
            did: grams(text, n) for did, src, text in docs if src == "src0"
        }
        train = {
            did: grams(text, n) for did, src, text in docs if src != "src0"
        }
        n_grams_bench = sum(len(g) for g in bench.values())
        pairs = [
            (t, b)
            for t, tg in train.items()
            for b, bg in bench.items()
            if bg and len(tg & bg) * 2 >= len(bg)
        ]
        want.append(
            (
                n,
                n_grams_bench,
                len(pairs),
                len({t for t, _ in pairs}),
                len({b for _, b in pairs}),
            )
        )
    assert got == sorted(want), seed
    # non-vacuity: flagged pairs exist and never increase with gram size
    np_ = [w[2] for w in sorted(want)]
    assert np_[0] > 0 and all(a >= b for a, b in zip(np_, np_[1:])), seed


@pytest.mark.parametrize("seed", range(6))
def test_quant_bits_sweep_oracle_on_random_tables(seed):
    """embedding_quant_bits_sweep (r12 tier-0): absmax ternary/int4/int8
    quantization distortion in exact L-micro units, rederived from
    scratch on dyadic-rational vectors — per-element q = half-away
    round of one float quotient, integer residuals, the two rounded
    ratio columns, and the zero-vector exclusion."""
    from paraslice_spark.operators.similarity import _QB_SWEEP

    rng = random.Random(19_000 + seed)
    dim = rng.randrange(4, 12)
    vecs = []
    for vid in range(rng.randrange(10, 30)):
        k = [rng.randrange(-64, 65) for _ in range(dim)]
        if vid == 0:
            k = [0] * dim  # plant an all-zero vector: must be excluded
        vecs.append((vid, k))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(vid, [x / 64.0 for x in k]) for vid, k in vecs],
    )
    got = con.execute(ORACLES["embedding_quant_bits_sweep"]).fetchall()

    mvs = [
        [x * 15625 for x in k]  # 1e6/64 = 15625 exactly
        for _vid, k in vecs
        if any(k)
    ]
    n_vecs = len(mvs)
    l1 = sum(abs(x) for mv in mvs for x in mv)
    energy = sum(x * x for mv in mvs for x in mv)
    want = []
    for b, lv in _QB_SWEEP:
        sa = sse = 0
        for mv in mvs:
            s = max(abs(x) for x in mv)
            for x in mv:
                q = int(_rnd(lv * x / s, 0))
                e = abs(lv * x - q * s)
                sa += e
                sse += e * e
        want.append(
            (b, lv, n_vecs, l1, energy, sa, sse,
             _rnd(sa / (lv * l1), 6),
             _rnd(math.sqrt(sse) / (lv * math.sqrt(energy)), 6))
        )
    assert got == sorted(want), seed
    # non-vacuity: distortion strictly decreasing in bit width
    rr = [w[8] for w in sorted(want)]
    assert rr[0] > rr[1] > rr[2] > 0, seed
