"""Property / cross-query consistency tests for the r8-continuation
additions (doc chunking, hashed features, dataset mix, CMS join-size,
session concurrency, per-nation Gini).

The oracle-diff layer already hash-checks each query against DuckDB;
these pin the SEMANTICS against independent recomputation (pure-Python
chunker / hasher on the collected sf0.001 corpus) and the structural
invariants the docstrings promise (coverage, overestimate one-sidedness,
Gini bounds, cross-query count agreement)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

import paraslice_spark.operators  # noqa: F401
from paraslice_spark.operators.text import CHUNK_S, CHUNK_W, HASH_FEAT_B
from paraslice_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_doc_chunks_match_pure_python_chunker(spark):
    """Every (doc, chunk) row — id, start, width, digest — must equal a
    from-scratch Python implementation of the W/S window rule."""
    from paraslice_spark.sources.io import load_tables

    docs = {
        r["doc_id"]: r["text"]
        for r in load_tables(spark, SF_SMALL)["documents"].collect()
    }
    expect = {}
    for doc_id, text in docs.items():
        words = text.split(" ")
        for k, start in enumerate(range(0, len(words), CHUNK_S)):
            chunk = words[start : start + CHUNK_W]
            expect[(doc_id, k + 1)] = (start + 1, len(chunk), _md5(" ".join(chunk)))
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["start_word"],
            r["n_chunk_words"],
            r["chunk_md5"],
        )
        for r in QUERIES["pipeline_doc_chunks"](spark, SF_SMALL).collect()
    }
    assert got == expect


def test_doc_chunks_cover_every_word(spark):
    """Coverage + overlap arithmetic: chunks tile each doc — the union of
    [start, start+n) spans exactly [1, n_words], consecutive starts differ
    by S, and only the LAST chunk may be narrower than W."""
    rows = QUERIES["pipeline_doc_chunks"](spark, SF_SMALL).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert chunks[0]["start_word"] == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_word"] - a["start_word"] == CHUNK_S
        # the last chunk ends exactly at the doc's word count …
        last = chunks[-1]
        n_words = last["start_word"] + last["n_chunk_words"] - 1
        # … every chunk's width is the clamp rule min(W, n - start + 1)
        # (chunks whose window overruns the tail are partial, full-W
        # otherwise), so spans [start, start+width) tile 1..n_words with
        # S-step starts — coverage with W-S overlap follows
        for c in chunks:
            assert c["n_chunk_words"] == min(
                CHUNK_W, n_words - c["start_word"] + 1
            )
        assert last["start_word"] <= n_words  # no empty chunk emitted


def test_hashed_features_match_pure_python(spark):
    """nnz / l1 / sq_norm / checksum per doc vs a hashlib+Counter
    reimplementation of the bucket rule (md5_u32(term) mod B)."""
    from collections import Counter

    from paraslice_spark.sources.io import load_tables

    docs = load_tables(spark, SF_SMALL)["documents"].collect()
    expect = {}
    for r in docs:
        tf = Counter(
            int(_md5(t)[:8], 16) % HASH_FEAT_B for t in r["text"].split(" ")
        )
        expect[r["doc_id"]] = (
            len(tf),
            sum(tf.values()),
            sum(v * v for v in tf.values()),
            sum((b + 1) * v for b, v in tf.items()),
        )
    got = {
        r["doc_id"]: (r["nnz"], r["l1"], r["sq_norm"], r["checksum"])
        for r in QUERIES["text_hashed_features"](spark, SF_SMALL).collect()
    }
    assert got == expect


def test_dataset_mix_invariants(spark):
    """Shares sum to <= 1e6 (floor division), every upsample >= 1e6, and
    the largest source's upsample is exactly 1e6 (it is its own target)."""
    rows = QUERIES["pipeline_dataset_mix"](spark, SF_SMALL).collect()
    assert rows
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000
    assert all(r["upsample_ppm"] >= 1_000_000 for r in rows)
    biggest = max(rows, key=lambda r: r["tokens"])
    assert biggest["upsample_ppm"] == 1_000_000


def test_cms_selfjoin_estimate_never_underestimates(spark):
    """CM inner-product one-sidedness: every term nonnegative, so
    overest >= 0 structurally; exact side equals a direct groupBy sum."""
    row = QUERIES["agg_cms_selfjoin_size"](spark, SF_SMALL).collect()[0]
    assert row["overest"] >= 0
    assert row["cms_est"] == row["exact_size"] + row["overest"]
    from paraslice_spark.sources.io import load_tables

    li = load_tables(spark, SF_SMALL)["lineitem"]
    exact = (
        li.groupBy("l_partkey")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    assert row["exact_size"] == exact


def test_session_concurrency_agrees_with_sessionize(spark):
    """Cross-query consistency: summing each session's hour-span over
    events_sessionize's session table must reproduce the concurrency
    histogram's total, and per-hour users can never exceed sessions."""
    conc = QUERIES["events_session_concurrency"](spark, SF_SMALL).collect()
    assert conc
    for r in conc:
        assert 1 <= r["n_users"] <= r["n_sessions"]
    from paraslice_spark.sources.io import load_tables

    ev = load_tables(spark, SF_SMALL)["events"]
    sess = (
        QUERIES["events_sessionize"](spark, SF_SMALL)
        .join(ev.select("event_id", "ts_ns"), "event_id")
        .groupBy("user_id", "session_idx")
        .agg(
            F.expr("max(ts_ns) div 3600000000000 - min(ts_ns) div 3600000000000 + 1")
            .alias("span_hours")
        )
        .agg(F.sum("span_hours"))
        .collect()[0][0]
    )
    assert sum(r["n_sessions"] for r in conc) == sess


def test_gini_bounds_and_revenue_total(spark):
    """0 <= G < 1 per nation, and the per-nation revenue partition sums
    back to total order revenue (nothing dropped by the joins)."""
    rows = QUERIES["customer_gini_by_nation"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r
    from paraslice_spark.functions.canon import cents
    from paraslice_spark.sources.io import load_tables

    total_c = (
        load_tables(spark, SF_SMALL)["orders"]
        .agg(F.sum(cents("o_totalprice")))
        .collect()[0][0]
    )
    assert round(sum(r["revenue"] for r in rows), 2) == total_c / 100.0


def test_int8_quant_matches_numpy(spark):
    """q / err_sum vs a numpy reimplementation of absmax int8 symmetric
    quantization on the micro-quantized vectors."""
    import numpy as np

    from paraslice_spark.sources.io import load_tables

    vecs = {
        r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 1e6)
        .astype(np.int64)
        for r in load_tables(spark, SF_SMALL)["embeddings"].collect()
    }
    got = {
        r["vec_id"]: r
        for r in QUERIES["embedding_int8_quant_audit"](spark, SF_SMALL).collect()
    }
    assert set(got) == {v for v, m in vecs.items() if np.abs(m).max() > 0}
    for vid, vm in vecs.items():
        maxabs = int(np.abs(vm).max())
        if maxabs == 0:
            continue
        # np.round is banker's; the engines round half AWAY — replicate
        # via floor(x + 0.5) for positives and symmetric for negatives
        ratio = 127.0 * vm / maxabs
        q = np.sign(ratio) * np.floor(np.abs(ratio) + 0.5)
        q = q.astype(np.int64)
        r = got[vid]
        assert r["l1_q"] == int(np.abs(q).sum())
        assert r["checksum"] == int((np.arange(1, 65) * q).sum())
        assert r["err_sum"] == int(np.abs(127 * vm - q * maxabs).sum())
        assert abs(q).max() <= 127  # int8 range by construction


def test_cosine_histogram_accounts_for_all_pairs(spark):
    """Bin counts sum to C(sample, 2) and every bin sits inside [-1, 1]
    with min <= max; the corpus-calibration claim (no bin above cos 0.9
    on this fixture) holds.  The sample is fixed-SIZE (hash-ordered
    LIMIT _COSHIST_K — VERDICT r11 #1), so the pair count is
    C(min(K, corpus), 2) at any corpus."""
    from paraslice_spark.operators.similarity import _COSHIST_K
    from paraslice_spark.sources.io import load_tables

    n_sample = min(
        _COSHIST_K, load_tables(spark, SF_SMALL)["embeddings"].count()
    )
    rows = QUERIES["embedding_cosine_histogram"](spark, SF_SMALL).collect()
    assert sum(r["n_pairs"] for r in rows) == n_sample * (n_sample - 1) // 2
    for r in rows:
        assert 0 <= r["bin"] <= 20
        assert -1.0 <= r["min_cos"] <= r["max_cos"] <= 1.0
        # rounded cos inside its bin (floor rule)
        import math

        assert math.floor((r["min_cos"] + 1.0) * 10) == r["bin"]
        assert math.floor((r["max_cos"] + 1.0) * 10) == r["bin"]


def test_funnel_latency_agrees_with_funnel_counts(spark):
    """Composition consistency: the latency table's populations are
    exactly the funnel's stage-2 and stage-3 user counts, latencies are
    non-negative, and p50 <= p90 <= max span."""
    lat = {
        r["step"]: r
        for r in QUERIES["events_funnel_latency"](spark, SF_SMALL).collect()
    }
    funnel = {
        r["stage"]: r["users"]
        for r in QUERIES["events_funnel"](spark, SF_SMALL).collect()
    }
    assert lat["view_to_click"]["n"] == funnel[2]
    assert lat["click_to_purchase"]["n"] == funnel[3]
    for r in lat.values():
        assert 0 <= r["p50_s"] <= r["p90_s"]
        assert 0 <= r["mean_s"]


def test_hhi_bounds(spark):
    """1/n <= HHI <= 1, top_share <= HHI^0.5 bound is loose — assert the
    tight structural ones: top_share <= 1, HHI >= 1/n_suppliers and
    HHI >= top_share^2 (the max term alone)."""
    rows = QUERIES["supplier_hhi_by_type"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r["hhi"] <= 1.0
        assert r["hhi"] >= 1.0 / r["n_suppliers"] - 1e-9
        assert r["hhi"] >= r["top_share"] ** 2 - 1e-9
        assert 0 < r["top_share"] <= 1.0


def test_streaming_sessionize_gap_matches_shared_constant():
    """streams.stream_sessionize's default gap must equal the shared
    reshape.SESSION_GAP_NS (the streaming module keeps a parameter
    default rather than importing reshape — this pins the two)."""
    import inspect

    from paraslice_spark.operators.reshape import SESSION_GAP_NS
    from paraslice_spark.streaming.streams import stream_sessionize

    sig = inspect.signature(stream_sessionize)
    assert sig.parameters["gap_ns"].default == SESSION_GAP_NS


def test_length_buckets_conserve_words_and_bound_waste(spark):
    """Bucket partition conserves the corpus word count; per-bucket
    padding is < PAD_STEP per doc (the cap rounds up by less than one
    step); caps are positive multiples of the step."""
    from paraslice_spark.operators.text import PAD_STEP

    rows = QUERIES["pipeline_length_buckets"](spark, SF_SMALL).collect()
    assert rows
    from paraslice_spark.operators.text import doc_words
    from paraslice_spark.sources.io import load_tables

    total = (
        load_tables(spark, SF_SMALL)["documents"]
        .select(F.size(doc_words()).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["total_words"] for r in rows) == total
    for r in rows:
        assert r["bucket_cap"] > 0 and r["bucket_cap"] % PAD_STEP == 0
        assert r["pad_words"] < r["n_docs"] * PAD_STEP
        assert 0 <= r["waste_ppm"] < 1_000_000


def test_kmv_fallback_and_plan(spark):
    """KMV: groups under k distinct keys report exact (err 0) — sf0.001
    has 15 users/type < k=64 — and the rank window prunes via
    WindowGroupLimit (the bottom-k reservoir shape)."""
    rows = QUERIES["agg_kmv_distinct_error"](spark, SF_SMALL).collect()
    assert rows and all(r["err"] == 0 and r["kmv_n"] == r["exact_n"] for r in rows)
    p = (
        QUERIES["agg_kmv_distinct_error"](spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in p, p


def test_watermark_audit_on_planted_disorder(spark):
    """The late-detection machinery (three-level prefix scan + Spark's
    eviction rule) must reproduce a pure-Python streaming replay on a
    PLANTED disordered arrival stream — the fixture arrives in order
    (n_late structurally 0, measured), so this is where the rule is
    actually exercised (the phash planted-perturbation pattern)."""
    import random

    from paraslice_spark.operators.reshape import (
        WM_DELAY_NS,
        watermark_late_counts,
    )

    rng = random.Random(42)
    base = 1_700_000_000_000_000_000
    rows = []
    ts_list = []
    for i in range(5_000):
        # event times drift forward with heavy jitter -> real disorder
        ts = base + i * 7_000_000_000 + rng.randrange(0, 3_600_000_000_000)
        rows.append((i, ts))
        ts_list.append(ts)
    df = spark.createDataFrame(rows, "event_id long, ts_ns long").repartition(8)
    got = {
        r["hr"]: (r["n_events"], r["n_late"])
        for r in watermark_late_counts(df).collect()
    }
    # pure-Python replay of Spark's watermark eviction
    expect: dict[int, list] = {}
    prefix = None
    for i, ts in enumerate(ts_list):  # arrival order = event_id order
        hr = ts // 3_600_000_000_000
        hr_end = (hr + 1) * 3_600_000_000_000
        late = prefix is not None and prefix - WM_DELAY_NS >= hr_end
        e = expect.setdefault(hr, [0, 0])
        e[0] += 1
        e[1] += int(late)
        prefix = ts if prefix is None else max(prefix, ts)
    assert got == {h: tuple(v) for h, v in expect.items()}
    assert sum(v[1] for v in expect.values()) > 0  # disorder really bites


def test_watermark_replay_matches_python_eviction(spark):
    """The DECLARED planted-disorder surface (events_watermark_late_replay)
    must reproduce a pure-Python streaming replay of Spark's eviction rule
    over the md5-permuted arrival order — hashlib is the third engine here
    (independent of both Spark's and DuckDB's md5), so the permutation rule
    itself is pinned, not just the two engines' agreement on it."""
    from paraslice_spark.operators.reshape import WM_DELAY_NS
    from paraslice_spark.sources.io import load_tables

    got = {
        r["hr"]: (r["n_events"], r["n_late"])
        for r in QUERIES["events_watermark_late_replay"](
            spark, SF_SMALL
        ).collect()
    }
    ev = [
        (r["event_id"], r["ts_ns"])
        for r in load_tables(spark, SF_SMALL)["events"]
        .select("event_id", "ts_ns")
        .collect()
    ]
    arrival = sorted(
        ev,
        key=lambda r: (
            int(hashlib.md5(str(r[0]).encode()).hexdigest()[:8], 16),
            r[0],
        ),
    )
    expect: dict[int, list] = {}
    prefix = None
    n_late_total = 0
    for _eid, ts in arrival:
        hr = ts // 3_600_000_000_000
        hr_end = (hr + 1) * 3_600_000_000_000
        late = prefix is not None and prefix - WM_DELAY_NS >= hr_end
        e = expect.setdefault(hr, [0, 0])
        e[0] += 1
        e[1] += int(late)
        n_late_total += int(late)
        prefix = ts if prefix is None else max(prefix, ts)
    assert got == {h: tuple(v) for h, v in expect.items()}
    assert n_late_total > 0  # the declared twin is NON-vacuous


def test_langid_eval_matrix_consistency(spark):
    """Confusion-matrix bookkeeping: cells partition the corpus (total
    matches doc count), per-lang shares floor-sum to <= 1e6, and cell
    counts agree with a direct recount of the composed prediction."""
    rows = QUERIES["text_langid_eval"](spark, SF_SMALL).collect()
    assert rows
    from paraslice_spark.sources.io import load_tables

    n_docs = load_tables(spark, SF_SMALL)["documents"].count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["row_share_ppm"]
        assert 0 < r["row_share_ppm"] <= 1_000_000
    assert all(v <= 1_000_000 for v in by_lang.values())
    pred = {
        (r["lang"], r["pred_class"]): r["n_docs"] for r in rows
    }
    d = load_tables(spark, SF_SMALL)["documents"]
    direct = {
        (r["lang"], r["pred_class"]): r["count"]
        for r in QUERIES["text_langid"](spark, SF_SMALL)
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred_class")
        .count()
        .collect()
    }
    assert pred == direct


def test_stats_collect_matches_direct_aggregates(spark):
    """Each profiled column's row in the long-format stats pass must equal
    a direct per-column aggregation (the ANALYZE numbers are real)."""
    from paraslice_spark.functions.canon import cents
    from paraslice_spark.sources.io import load_tables

    li = load_tables(spark, SF_SMALL)["lineitem"]
    got = {r["col"]: r for r in QUERIES["stats_collect_lineitem"](spark, SF_SMALL).collect()}
    assert set(got) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_partkey", "l_suppkey"
    }
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(cents("l_quantity")).alias("ndv_q"),
        F.min(cents("l_quantity")).alias("min_q"),
        F.sum(cents("l_extendedprice")).alias("sum_p"),
        F.countDistinct("l_partkey").alias("ndv_pk"),
    ).collect()[0]
    q = got["l_quantity"]
    assert (q["n"], q["ndv"], q["min_v"]) == (direct["n"], direct["ndv_q"], direct["min_q"])
    assert got["l_extendedprice"]["sum_v"] == direct["sum_p"]
    assert got["l_partkey"]["ndv"] == direct["ndv_pk"]
    assert all(r["n_null"] == 0 for r in got.values())


def test_hist_selection_matches_numpy_nearest_rank(spark):
    """The shared hist_selection_frame/hist_at_rank machinery must select
    EXACTLY the nearest-rank order statistic for arbitrary multisets —
    one Spark job over 40 seeded random groups (duplicates, skew, and
    single-value groups included), checked against a direct sort."""
    import random

    from paraslice_spark.operators.aggregates import (
        hist_at_rank,
        hist_selection_frame,
    )

    rng = random.Random(7)
    rows = []
    groups: dict[str, list] = {}
    for g in range(40):
        key = f"g{g}"
        n = rng.choice([1, 2, 3, 7, 50, 500])
        vals = [
            rng.randrange(0, rng.choice([2, 10, 10_000_000])) for _ in range(n)
        ]
        groups[key] = sorted(vals)
        rows += [(key, v) for v in vals]
    df = spark.createDataFrame(rows, "k string, v long").repartition(8)
    hist = df.groupBy("k", "v").agg(F.count(F.lit(1)).alias("cnt"))
    r = hist_selection_frame(hist, "k", "v")
    got = {
        row["k"]: (row["p50"], row["p90"])
        for row in r.groupBy("k")
        .agg(
            hist_at_rank("v", "(n + 1) div 2").alias("p50"),
            hist_at_rank("v", "(9 * n + 9) div 10").alias("p90"),
        )
        .collect()
    }
    for key, vals in groups.items():
        n = len(vals)
        assert got[key] == (
            vals[(n + 1) // 2 - 1],
            vals[(9 * n + 9) // 10 - 1],
        ), key


def test_delay_sweep_consistent_and_monotone(spark):
    """The sweep's 600 s row must equal the replay's per-hour n_late
    summed (same permutation, same rule, WM_DELAY_NS = 600 s), and loss
    must be monotone non-increasing in delay with exact ppm bookkeeping."""
    rows = sorted(
        (r["delay_s"], r)
        for r in QUERIES["events_watermark_delay_sweep"](
            spark, SF_SMALL
        ).collect()
    )
    replay_late = sum(
        r["n_late"]
        for r in QUERIES["events_watermark_late_replay"](
            spark, SF_SMALL
        ).collect()
    )
    by_delay = {d: r for d, r in rows}
    assert by_delay[600]["n_late"] == replay_late
    lates = [r["n_late"] for _, r in rows]
    assert lates == sorted(lates, reverse=True)  # longer delay loses less
    for _, r in rows:
        assert r["loss_ppm"] == r["n_late"] * 1_000_000 // r["n_events"]
        assert 0 < r["n_late"] <= r["n_events"]  # non-vacuous at every delay
