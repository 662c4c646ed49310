"""Fuzz-tail closure, part 2: one random-table rederivation per
composed/statistical oracle FAMILY that still lacked one after the six
named closures (test_r10_fuzz_tail) — sketch-error audits (KMV rep),
robust anomaly (MAD rep), nonparametric sequence tests (runs-test rep),
rank-selection reporting (ntile deciles rep), distribution fitting
(Zipf rep), embedding quantization audits (int8 rep), spectral
decomposition (Haar rep), corpus ledger rollups (token-budget rep),
two md5-pipeline reps (hashing-trick featurization; the
packing-ledger append audit with planted exact-chunk boundaries), and
two count-min reps (inner-product join-size estimate; per-key point
estimates on the exact top-10 under Pareto-skewed keys), the heavy
hash pipelines themselves — banded MinHash (16 affine min-hashes, 4×4
banding, exact-Jaccard comparison), 64-bit SimHash (repeated-token
votes, strict majority, hamming ≤ 3), exact bigram Jaccard — the
sample-pair cosine histogram, and the shared _KNN_ORACLE spec on
dyadic-rational vectors (exact float64 sums → no summation-order
hazard).
Same discipline as every *_oracle_fuzz file."""

from __future__ import annotations

import datetime
import hashlib
import math
import random

import duckdb
import pytest

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.registry import ORACLES


def _md5u32(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def _rnd(x: float, p: int) -> float:
    s = 10 ** p
    return math.floor(abs(x) * s + 0.5) / s * (1 if x >= 0 else -1)


@pytest.mark.parametrize("seed", range(6))
def test_kmv_distinct_error_oracle_on_random_tables(seed):
    """Covers BOTH branches: types with < 64 distinct users (exact
    fallback, vk NULL) and types with enough for the 64th-minimum
    estimator."""
    rng = random.Random(13_000 + seed)
    rows = []
    for eid in range(rng.randrange(200, 900)):
        ty = rng.choice(["small", "big", "mid"])
        dom = {"small": 30, "mid": 90, "big": 400}[ty]
        rows.append((ty, rng.randrange(1, dom)))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_type VARCHAR, user_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(ORACLES["agg_kmv_distinct_error"]).fetchall()
    by_ty: dict[str, set] = {}
    for ty, u in rows:
        by_ty.setdefault(ty, set()).add(u)
    want = []
    for ty in sorted(by_ty):
        us = by_ty[ty]
        n = len(us)
        hs = sorted(_md5u32(u) for u in us)
        if n < 64:
            want.append((ty, n, n, 0))
        else:
            est = (64 - 1) * 4294967296 // hs[63]
            want.append((ty, n, est, est - n))
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_anomaly_mad_oracle_on_random_tables(seed):
    rng = random.Random(13_100 + seed)
    rows = []
    for _ in range(rng.randrange(30, 300)):
        ty = rng.choice(["a", "b", "c"])
        # small micro-exact domain forces ties and even/odd medians
        rows.append((ty, rng.randrange(0, 40) / 2.0))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(ORACLES["events_anomaly_mad"]).fetchall()
    by_ty: dict[str, list[int]] = {}
    for ty, v in rows:
        by_ty.setdefault(ty, []).append(round(v * 1e6))
    want = []
    for ty in sorted(by_ty):
        mv = sorted(by_ty[ty])
        n = len(mv)
        med2 = mv[(n - 1) // 2] + mv[n // 2]
        dev = sorted(abs(2 * x - med2) for x in mv)
        mad2 = dev[(n - 1) // 2] + dev[n // 2]
        n_out = sum(1 for d in dev if 2 * d > 3 * mad2)
        want.append((ty, n, med2 / 2e6, mad2 / 4e6, n_out))
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_runs_test_oracle_on_random_tables(seed):
    rng = random.Random(13_200 + seed)
    base = datetime.datetime(2024, 6, 1)
    rows, eid = [], 0
    for h in range(rng.randrange(40, 120)):
        # ~1/8 empty hours exercise the zero-filled spine
        c = 0 if rng.random() < 0.125 else rng.choice([1, 1, 2, 2, 3, 5, 8])
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, base + datetime.timedelta(hours=h, minutes=rng.randrange(60)))
            )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(ORACLES["events_runs_test"]).fetchall()
    cnt: dict[int, int] = {}
    for _eid, ts in rows:
        m = int((ts - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
        cnt[m] = cnt.get(m, 0) + 1
    lo, hi = min(cnt), max(cnt)
    series = [cnt.get(m, 0) for m in range(lo, hi + 1)]
    xs = sorted(series)
    nn = len(xs)
    # value median: smallest v with cum >= (n+1)//2 over the value hist
    target = (nn + 1) // 2
    cum = 0
    med = None
    for v in xs:
        cum += 1
        if cum >= target:
            med = v
            break
    sgns = [1 if x > med else 0 for x in series if x != med]
    n1, n2 = sum(sgns), len(sgns) - sum(sgns)
    assert n1 > 0 and n2 > 0, "degenerate draw — retune seed base"
    runs = 1 + sum(1 for a, b in zip(sgns, sgns[1:]) if a != b)
    e = 2.0 * n1 * n2 / (n1 + n2)
    z = _rnd((runs - (e + 1.0)) / math.sqrt(e * (e - 1.0) / (n1 + n2 - 1)), 6)
    assert got == [(med, n1, n2, runs, z)], seed


@pytest.mark.parametrize("seed", range(6))
def test_revenue_deciles_oracle_on_random_tables(seed):
    rng = random.Random(13_300 + seed)
    rows = [
        (ok, rng.randrange(1, 60), rng.randrange(100, 800_000) / 100.0)
        for ok in range(1, rng.randrange(25, 250))
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT,"
        " o_totalprice DOUBLE)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?)", rows)
    got = con.execute(ORACLES["customer_revenue_deciles"]).fetchall()
    spend: dict[int, int] = {}
    for _ok, ck, p in rows:
        spend[ck] = spend.get(ck, 0) + round(p * 100)
    ordered = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ordered)
    size, rem = n // 10, n % 10
    want_map: dict[int, list[int]] = {}
    idx = 0
    for tile in range(1, 11):
        take = size + (1 if tile <= rem else 0)
        for _ in range(take):
            if idx >= n:
                break
            want_map.setdefault(tile, []).append(ordered[idx][1])
            idx += 1
    total = sum(spend.values())
    want = [
        (t, len(v), sum(v) / 100.0, _rnd(sum(v) / total, 6))
        for t, v in sorted(want_map.items())
    ]
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_zipf_fit_oracle_on_random_tables(seed):
    rng = random.Random(13_400 + seed)
    vocab = [f"w{i}" for i in range(rng.randrange(8, 40))]
    docs = []
    for did in range(rng.randrange(5, 30)):
        words = [
            vocab[min(int(rng.paretovariate(1.2)) - 1, len(vocab) - 1)]
            for _ in range(rng.randrange(5, 80))
        ]
        docs.append((did, " ".join(words)))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = con.execute(ORACLES["text_zipf_fit"]).fetchall()
    wc: dict[str, int] = {}
    for _d, text in docs:
        for w in text.split(" "):
            wc[w] = wc.get(w, 0) + 1
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(r + 1) for r in range(len(ranked))]
    ys = [math.log(c) for _w, c in ranked]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = _rnd(sxy / sxx, 6)
    r2 = _rnd(sxy * sxy / (sxx * syy), 6)
    assert got == [(slope, r2, n)], seed


@pytest.mark.parametrize("seed", range(6))
def test_int8_quant_audit_oracle_on_random_tables(seed):
    rng = random.Random(13_500 + seed)
    vecs = []
    for vid in range(rng.randrange(5, 40)):
        emb = [rng.randrange(-600_000, 600_000) / 1e6 for _ in range(64)]
        if rng.random() < 0.1:
            emb = [0.0] * 64  # maxabs = 0 rows must vanish from the audit
        vecs.append((vid, emb))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", vecs)
    got = con.execute(
        ORACLES["embedding_int8_quant_audit"]
        + " ORDER BY vec_id"  # registered oracle relies on driver sort
    ).fetchall()
    want = []
    for vid, emb in vecs:
        vm = [round(x * 1e6) for x in emb]
        maxabs = max(abs(v) for v in vm)
        if maxabs == 0:
            continue
        qs = [
            int(math.floor(abs(127.0 * v / maxabs) + 0.5))
            * (1 if v >= 0 else -1)
            for v in vm
        ]
        err = sum(abs(127 * v - q * maxabs) for v, q in zip(vm, qs))
        want.append(
            (
                vid,
                maxabs / 1e6,
                sum(1 for q in qs if q != 0),
                sum(abs(q) for q in qs),
                sum((i + 1) * q for i, q in enumerate(qs)),
                err,
                _rnd(err / 8_128_000_000.0, 9),
            )
        )
    assert got == sorted(want), seed


@pytest.mark.parametrize("seed", range(6))
def test_haar_energy_oracle_on_random_tables(seed):
    rng = random.Random(13_600 + seed)
    base = datetime.datetime(2024, 7, 1)
    rows, eid = [], 0
    for h in range(rng.randrange(100, 1024)):
        for _ in range(rng.choice([0, 0, 1, 1, 2, 3, 7])):
            eid += 1
            rows.append((eid, base + datetime.timedelta(hours=h)))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(ORACLES["events_haar_energy"]).fetchall()
    cnt: dict[int, int] = {}
    for _eid, ts in rows:
        m = int((ts - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
        cnt[m] = cnt.get(m, 0) + 1
    lo = min(cnt)
    s = [cnt.get(lo + i, 0) for i in range(1024)]
    want = []
    for lvl in range(1, 11):
        pairs = [(s[2 * i], s[2 * i + 1]) for i in range(len(s) // 2)]
        want.append(
            (lvl, len(pairs), sum((a - b) ** 2 for a, b in pairs))
        )
        s = [a + b for a, b in pairs]
    want = [(0, 1, s[0] * s[0])] + want
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_token_budget_oracle_on_random_tables(seed):
    rng = random.Random(13_700 + seed)
    docs = []
    for did in range(1, rng.randrange(30, 200)):
        text = " ".join(
            rng.choice(["aa", "bb", "cc"])
            for _ in range(rng.randrange(1, 40))
        )
        docs.append((did, text, rng.randrange(1, 500)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    got = con.execute(ORACLES["pipeline_token_budget"]).fetchall()
    agg: dict[str, list[int]] = {}
    for did, text, nc in docs:
        h = hashlib.md5(str(did).encode()).hexdigest()[0]
        split = "train" if h < "c" else ("val" if h < "e" else "test")
        e = agg.setdefault(split, [0, 0, 0])
        e[0] += 1
        e[1] += len(text.split(" "))
        e[2] += nc
    total = sum(v[1] for v in agg.values())
    want = [
        (s, v[0], v[1], v[2], _rnd(v[1] / v[0], 6), _rnd(v[1] / total, 6))
        for s, v in sorted(agg.items())
    ]
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_hashed_features_oracle_on_random_tables(seed):
    """md5-pipeline family rep #2 (hashing-trick featurization):
    colliding buckets forced by a small vocabulary over 1024 bins."""
    rng = random.Random(13_800 + seed)
    vocab = [f"t{i}" for i in range(rng.randrange(3, 60))]
    docs = [
        (
            did,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(1, 50))
            ),
        )
        for did in range(1, rng.randrange(10, 80))
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = sorted(
        con.execute(ORACLES["text_hashed_features"]).fetchall()
    )
    want = []
    for did, text in docs:
        tf: dict[int, int] = {}
        for term in text.split(" "):
            b = _md5u32(term) % 1024
            tf[b] = tf.get(b, 0) + 1
        want.append(
            (
                did,
                len(tf),
                sum(tf.values()),
                sum(c * c for c in tf.values()),
                sum((b + 1) * c for b, c in tf.items()),
            )
        )
    assert got == sorted(want), seed


@pytest.mark.parametrize("seed", range(6))
def test_pack_append_audit_oracle_on_random_tables(seed):
    """md5-pipeline family rep #3 (packing-ledger stability): sparse and
    dense id regimes swing which shards receive appends; exact 512-token
    chunk boundaries planted via controlled doc lengths."""
    rng = random.Random(13_900 + seed)
    docs, did = [], 0
    for _ in range(rng.randrange(20, 200)):
        did += rng.randrange(1, rng.choice([2, 15]))
        # lengths hit exact multiples of the 512 chunk size sometimes
        n_tok = rng.choice([1, 7, 64, 128, 256, 512, 513])
        docs.append((did, " ".join("w" for _ in range(n_tok))))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = sorted(
        con.execute(ORACLES["pipeline_pack_append_audit"]).fetchall()
    )
    cutoff = max(d for d, _ in docs) * 9 // 10
    shards: dict[str, list] = {}
    for did_, text in sorted(docs):
        b = hashlib.md5(str(did_).encode()).hexdigest()[0]
        shards.setdefault(b, []).append(
            (did_, len(text.split(" ")), did_ > cutoff)
        )
    want = []
    for b, rows in sorted(shards.items()):
        off = 0
        chunks = []
        for _did, tok, is_new in rows:
            chunks.append((off // 512, is_new))
            off += tok
        n_old = sum(1 for _c, n in chunks if not n)
        n_new = sum(1 for _c, n in chunks if n)
        last_old = max((c for c, n in chunks if not n), default=None)
        first_new = min((c for c, n in chunks if n), default=None)
        # all-new shards: MIN(new) <= MAX(old) is NULL -> the CASE's ELSE 0
        rewritten = (
            0
            if n_new == 0 or last_old is None
            else (1 if first_new <= last_old else 0)
        )
        want.append(
            (
                b,
                n_old,
                n_new,
                max(c for c, _n in chunks) + 1,
                last_old,
                first_new,
                rewritten,
            )
        )
    assert got == want, seed


_CMS_A = (131071, 786433, 919393, 611953)
_CMS_B = (524287, 196613, 374321, 786431)
_CMS_P = 2147483647
_CMS_W = 256


def _cms_counters(freqs: dict[int, int]) -> list[dict[int, int]]:
    """From-scratch 4x256 count-min table over md5-u32 key hashes."""
    rows: list[dict[int, int]] = [{} for _ in range(4)]
    for key, n in freqs.items():
        h = _md5u32(key)
        for j in range(4):
            b = ((_CMS_A[j] * h + _CMS_B[j]) % _CMS_P) % _CMS_W
            rows[j][b] = rows[j].get(b, 0) + n
    return rows


@pytest.mark.parametrize("seed", range(6))
def test_cms_selfjoin_size_oracle_on_random_tables(seed):
    """CMS family rep #1: the inner-product join-size estimate, with a
    skewed key so the estimate's collision overestimate is nonzero."""
    rng = random.Random(14_000 + seed)
    li = [
        (min(int(rng.paretovariate(0.9)), 500),)
        for _ in range(rng.randrange(100, 900))
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE lineitem(l_partkey BIGINT)")
    con.executemany("INSERT INTO lineitem VALUES (?)", li)
    got = con.execute(ORACLES["agg_cms_selfjoin_size"]).fetchall()
    freqs: dict[int, int] = {}
    for (pk,) in li:
        freqs[pk] = freqs.get(pk, 0) + 1
    exact = sum(n * n for n in freqs.values())
    rows = _cms_counters(freqs)
    est = min(sum(c * c for c in r.values()) for r in rows)
    assert got == [
        (exact, est, est - exact, (est - exact) * 1_000_000 // exact)
    ], seed


@pytest.mark.parametrize("seed", range(6))
def test_countmin_topk_error_oracle_on_random_tables(seed):
    """CMS family rep #2: per-key point estimates on the exact top-10,
    with heavy hitters AND a long tail so bucket collisions inflate
    some estimates (the overest column's reason to exist)."""
    rng = random.Random(14_100 + seed)
    ev = []
    for eid in range(rng.randrange(200, 900)):
        u = min(int(rng.paretovariate(0.8)), 3000)
        ev.append((eid, u))
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, user_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?, ?)", ev)
    got = con.execute(ORACLES["agg_countmin_topk_error"]).fetchall()
    freqs: dict[int, int] = {}
    for _eid, u in ev:
        freqs[u] = freqs.get(u, 0) + 1
    rows = _cms_counters(freqs)
    est = {}
    for u in freqs:
        h = _md5u32(u)
        est[u] = min(
            rows[j][((_CMS_A[j] * h + _CMS_B[j]) % _CMS_P) % _CMS_W]
            for j in range(4)
        )
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [(u, n, est[u], est[u] - n) for u, n in top]
    assert got == want, seed


_MH_P = 2147483647
_MH_AB = (
    (2058367755, 1250378731), (1328920189, 372282286),
    (35052690, 260070992), (1425365892, 920539464),
    (409468654, 638079615), (1652464807, 2033713062),
    (1010120343, 873091422), (910172515, 1362467471),
    (1577225783, 708511551), (1389507383, 1784693824),
    (2003597556, 347112816), (2133395955, 1638263921),
    (1962772767, 908613595), (1364526543, 932472842),
    (1976978008, 656157898), (1457334632, 212322978),
)


@pytest.mark.parametrize("seed", range(6))
def test_minhash_estimate_error_oracle_on_random_tables(seed):
    """The heaviest md5-pipeline rederivation: 8-char shingles, 16
    explicit affine min-hashes over 2^31-1, the 4x4 banded candidate
    rule, and the estimate-vs-exact-Jaccard audit — all from scratch.
    Planted exact copies and near-duplicates guarantee banded
    collisions; unrelated docs guarantee non-candidates."""
    rng = random.Random(14_200 + seed)
    alpha = "abcdefgh "
    docs = []
    did = 0
    for _ in range(rng.randrange(4, 10)):
        base = "".join(rng.choice(alpha) for _ in range(rng.randrange(20, 60)))
        did += 1
        docs.append((did, base))
        if rng.random() < 0.8:  # plant a near-dup or exact copy
            did += 1
            dup = base if rng.random() < 0.4 else base + rng.choice(alpha)
            docs.append((did, dup))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = con.execute(
        ORACLES["dedup_minhash_estimate_error"]
    ).fetchall()

    def shingle_set(text):
        return {
            text[i - 1 : i + 7]
            for i in range(1, max(len(text) - 6, 2))
        }

    sh = {d: shingle_set(t) for d, t in docs}
    sig = {
        d: [
            min((a * _md5u32_s(s) + b) % _MH_P for s in ss)
            for a, b in _MH_AB
        ]
        for d, ss in sh.items()
    }
    want = []
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            bands = any(
                sig[a][4 * j : 4 * j + 4] == sig[b][4 * j : 4 * j + 4]
                for j in range(4)
            )
            if not bands:
                continue
            n_match = sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
            inter = len(sh[a] & sh[b])
            exact = inter / (len(sh[a]) + len(sh[b]) - inter)
            want.append(
                (
                    a,
                    b,
                    _rnd(n_match / 16.0, 6),
                    _rnd(exact, 6),
                    _rnd(abs(n_match / 16.0 - exact), 6),
                )
            )
    assert got == want, seed
    assert want, "no planted candidate survived — retune seed base"


def _md5u32_s(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.mark.parametrize("seed", range(6))
def test_cosine_histogram_oracle_on_random_tables(seed):
    """Embedding family rep #2: the sample-pair cosine sketch — planted
    clusters guarantee high-cosine bins, the deterministic fixed-SIZE
    hash-ordered sample rule (md5-u32 order, LIMIT _COSHIST_K — VERDICT
    r11 #1; corpus sizes straddle K so the cut binds on some seeds) and
    the exact-integer dot / IEEE sqrt product chain rederived from
    scratch."""
    from paraslice_spark.operators.similarity import _COSHIST_K

    rng = random.Random(14_300 + seed)
    dim = rng.choice((8, 16))
    centers = [
        [rng.randrange(-500_000, 500_000) for _ in range(dim)]
        for _ in range(3)
    ]
    vecs = []
    for vid in range(rng.randrange(120, 320)):
        c = rng.choice(centers)
        vecs.append(
            (
                vid,
                [
                    (c[d] + rng.randrange(-50_000, 50_000)) / 1e6
                    for d in range(dim)
                ],
            )
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", vecs)
    got = sorted(
        con.execute(ORACLES["embedding_cosine_histogram"]).fetchall()
    )
    cohort = sorted(
        (vid for vid, _ in vecs), key=lambda v: (_md5u32_s(str(v)), v)
    )[:_COSHIST_K]
    keep = set(cohort)
    sample = [
        (vid, [round(x * 1e6) for x in emb])
        for vid, emb in vecs
        if vid in keep
    ]
    bins: dict[int, list[float]] = {}
    for i, (va, ma) in enumerate(sample):
        sa = sum(x * x for x in ma)
        for vb, mb in sample[i + 1 :]:
            sb = sum(x * x for x in mb)
            dot = sum(x * y for x, y in zip(ma, mb))
            cos = _rnd(dot / (math.sqrt(sa) * math.sqrt(sb)), 6)
            bins.setdefault(math.floor((cos + 1.0) * 10), []).append(cos)
    want = sorted(
        (b, len(cs), min(cs), max(cs)) for b, cs in bins.items()
    )
    assert got == want, seed


@pytest.mark.parametrize("seed", range(6))
def test_simhash_bands_oracle_on_random_tables(seed):
    """Heavy md5 rep #2: the 64-bit SimHash — per-token md5 hi/lo u32
    words, repeated-token votes (tok is NOT deduped), the strict
    2·cnt > n majority rule, and the hamming ≤ 3 pair cut — all
    rederived from scratch on planted near-duplicates (1-2 word edits)
    and unrelated documents."""
    rng = random.Random(14_400 + seed)
    vocab = [f"w{i}" for i in range(40)]
    docs, did = [], 0
    for i in range(rng.randrange(4, 9)):
        words = [rng.choice(vocab) for _ in range(rng.randrange(12, 40))]
        did += 1
        docs.append((did, " ".join(words)))
        if i == 0 or rng.random() < 0.8:
            dup = list(words)
            if i > 0:  # near-dup: edit 1-2 tokens (may or may not collide)
                for _ in range(rng.randrange(1, 3)):
                    dup[rng.randrange(len(dup))] = rng.choice(vocab)
            # i == 0: one EXACT duplicate guarantees a hamming-0 pair,
            # so the non-vacuity guard never depends on the draw
            did += 1
            docs.append((did, " ".join(dup)))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = con.execute(ORACLES["dedup_simhash_bands"]).fetchall()

    def simhash(tokens):
        votes = [0] * 64
        for w in tokens:
            hx = hashlib.md5(w.encode()).hexdigest()
            hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
            for b in range(64):
                votes[b] += (lo >> b) & 1 if b < 32 else (hi >> (b - 32)) & 1
        n = len(tokens)
        return sum(1 << b for b in range(64) if 2 * votes[b] > n)

    sig = {d: simhash(t.split(" ")) for d, t in docs}
    ids = sorted(sig)
    want = [
        (a, b, bin(sig[a] ^ sig[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    ]
    assert got == want, seed
    assert want, "no near-dup pair landed within hamming 3 — retune seeds"


@pytest.mark.parametrize("seed", range(6))
def test_knn_triangle_oracle_on_random_tables(seed):
    """Pins the shared _KNN_ORACLE spec itself (the SQL behind the
    triangle/degree/jaccard/pagerank/assortativity oracles) on random
    vectors: components are dyadic rationals k/64 so every product and
    partial sum is EXACT in float64 (order-independent — no engine
    summation-order hazard), cosines divide one exact dyadic dot by two
    IEEE sqrts, ranking uses the ROUNDED cosine with neighbor_id ties,
    and triangles are brute-force counted on the deduped undirected
    edge set."""
    rng = random.Random(14_500 + seed)
    dim = 8
    vecs = []
    for vid in range(rng.randrange(15, 40)):
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
    got = con.execute(ORACLES["graph_triangle_count"]).fetchall()
    norm2 = {vid: sum(x * x for x in k) for vid, k in vecs}
    edges = set()
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
            edges.add((min(vid, wid), max(vid, wid)))
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    tri = sum(
        1
        for u, vs in adj.items()
        for v in vs
        for w in adj.get(v, ())
        if w in adj.get(u, ())
    )
    assert got == [(tri, len(edges))], seed


@pytest.mark.parametrize("seed", range(6))
def test_ngram_jaccard_oracle_on_random_tables(seed):
    """Completes the dedup-trio rederivations (MinHash, SimHash, and now
    the EXACT bigram Jaccard): distinct adjacent-word bigrams over a
    small vocabulary (heavy gram collisions), the threshold applied to
    the ROUNDED value, exact copies guaranteeing pairs above the cut,
    pure Python."""
    rng = random.Random(14_600 + seed)
    vocab = [f"v{i}" for i in range(12)]
    docs, did = [], 0
    for i in range(rng.randrange(4, 9)):
        words = [rng.choice(vocab) for _ in range(rng.randrange(6, 25))]
        did += 1
        docs.append((did, " ".join(words)))
        if rng.random() < 0.8:
            dup = list(words)
            if i % 2:  # near-dup: one word edit
                dup[rng.randrange(len(dup))] = rng.choice(vocab)
            did += 1
            docs.append((did, " ".join(dup)))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    got = con.execute(ORACLES["dedup_ngram_jaccard"]).fetchall()

    def grams(text):
        ws = text.split(" ")
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    g = {d: grams(t) for d, t in docs}
    want = []
    ids = sorted(g)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(g[a] & g[b])
            if inter == 0:
                continue  # no shared gram -> no inter row at all
            j = _rnd(inter / (len(g[a]) + len(g[b]) - inter), 6)
            if j >= 0.6:
                want.append((a, b, j))
    assert got == want, seed
    assert want, "no pair cleared the 0.6 cut — retune seed base"


@pytest.mark.parametrize("seed", range(6))
def test_decontaminate_oracle_on_random_tables(seed):
    """Curation-screen rep: benchmark-contamination by distinct-bigram
    containment — planted train docs EMBEDDING a bench doc's text
    (contaminated, above the shared*2 >= n cut) next to clean docs,
    pure-Python rederivation."""
    rng = random.Random(14_700 + seed)
    vocab = [f"c{i}" for i in range(15)]

    def mk(n):
        return [rng.choice(vocab) for _ in range(n)]

    docs, did = [], 0
    benches = []
    for _ in range(rng.randrange(2, 5)):  # bench docs (source src0)
        did += 1
        b = mk(rng.randrange(5, 15))
        benches.append(b)
        docs.append((did, "src0", " ".join(b)))
    for _ in range(rng.randrange(3, 8)):  # train docs
        did += 1
        if rng.random() < 0.5 and benches:  # contaminated: embed a bench
            b = rng.choice(benches)
            text = mk(rng.randrange(0, 5)) + b + mk(rng.randrange(0, 5))
        else:
            text = mk(rng.randrange(5, 25))
        docs.append((did, f"src{rng.randrange(1, 4)}", " ".join(text)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, source VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    got = con.execute(ORACLES["text_decontaminate"]).fetchall()

    def grams(text):
        ws = text.split(" ")
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    bench = {d: grams(t) for d, s, t in docs if s == "src0"}
    train = {d: grams(t) for d, s, t in docs if s != "src0"}
    want = []
    for td in sorted(train):
        for bd in sorted(bench):
            shared = len(train[td] & bench[bd])
            if shared == 0 or shared * 2 < len(bench[bd]):
                continue
            want.append(
                (td, bd, shared, _rnd(shared / len(bench[bd]), 6))
            )
    assert got == want, seed
    assert want, "no planted contamination cleared the cut — retune seeds"
