"""Lint: the MATERIALIZED rule, systematized (VERDICT r10 next-round #4).

DuckDB inlines CTEs referenced more than once — it re-computes them per
reference — and re-runs anything referenced inside a recursive term PER
ITERATION.  This has bitten four times (dedup_method_agreement exhausted
the container disk at >80 GB of temp spill; assortativity, mode-skew and
phash_groups each cost an ADVICE round): a heavy CTE consumed by several
siblings, or by a recursive term, must say ``AS MATERIALIZED``.

This test parses EVERY registered oracle and flags any non-MATERIALIZED
CTE that is (a) table-referenced more than once, or (b) referenced inside
a self-referencing (recursive) CTE's body.  The rule is a RATCHET, not a
ban: ``_ACCEPTED`` freezes the 135 pre-existing cheap-CTE cases, each
measured-fine in the full-suite / sf0.1-sweep / regen-sweep time budgets
(r10 close gates).  Set EQUALITY is asserted both ways, so

* a NEW oracle with an unmaterialized multi-ref or in-recursive CTE fails
  here at birth — either MATERIALIZE it (the default for anything heavy)
  or consciously add the (query, cte) pair below with a reason; and
* materializing or removing an accepted CTE must also prune its pair, so
  the list never accretes stale entries.

The parser is regex+balanced-paren, tuned to the house oracle idiom (one
flat ``WITH`` list, FROM/JOIN and comma-join table references).  It is
self-tested below on synthetic SQL so the lint can't rot into vacuity.
"""

from __future__ import annotations

import re
from collections import Counter

import paraslice_spark.operators  # noqa: F401  (registers all oracles)
from paraslice_spark.registry import ORACLES


def _strip_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def _ctes(sql: str) -> list[tuple[str, bool, str]]:
    """(name, materialized, body) for every CTE at any nesting depth."""
    out = []
    for m in re.finditer(r"\b([a-zA-Z_]\w*)\s+AS\s+(MATERIALIZED\s+)?\(", sql):
        i = m.end() - 1
        depth = 0
        for j in range(i, len(sql)):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    out.append((m.group(1), bool(m.group(2)), sql[i + 1 : j]))
                    break
    return out


def _table_refs(sql: str) -> list[str]:
    """Identifiers in FROM/JOIN position, including comma-join tails."""
    refs = [
        m.group(1)
        for m in re.finditer(r"\b(?:FROM|JOIN)\s+([a-zA-Z_]\w*)", sql, re.I)
    ]
    comma_tail = (
        r"\bFROM\s+[a-zA-Z_]\w*(?:\s+[a-zA-Z_]\w*)?"
        r"((?:\s*,\s*[a-zA-Z_]\w*(?:\s+[a-zA-Z_]\w*)?)+)"
    )
    for m in re.finditer(comma_tail, sql, re.I):
        refs += [t.group(1) for t in re.finditer(r",\s*([a-zA-Z_]\w*)", m.group(1))]
    return refs


def _violations(sql: str) -> set[str]:
    """Names of non-MATERIALIZED CTEs that are multi-referenced or
    referenced inside a recursive CTE's body."""
    s = _strip_comments(sql)
    defs = _ctes(s)
    if not defs:
        return set()
    names = {n for n, _, _ in defs}
    cnt = Counter(r for r in _table_refs(s) if r in names)
    recursive = {n for n, _, b in defs if n in set(_table_refs(b))}
    bad = set()
    for n, mat, body in defs:
        if mat:
            continue
        # a recursive CTE's self-reference is structural, not a re-use
        n_refs = cnt[n] - _table_refs(body).count(n)
        in_rec = any(
            rn in recursive and rn != n and n in set(_table_refs(rb))
            for rn, _, rb in defs
        )
        if n_refs > 1 or in_rec:
            bad.add(n)
    return bad


# The frozen pre-ratchet snapshot: every pair below predates this lint and
# is measured-cheap at fixture SFs (r10 close gates: full suite 789 s,
# sf0.1 sweep 334 s, regen sweep 232 s — all within budget with these
# inlined).  Do NOT add to this list reflexively: MATERIALIZE first;
# extend only for a provably cheap CTE, with the measurement in the
# oracle's docstring.
_ACCEPTED: frozenset[tuple[str, str]] = frozenset(
    {
        ("agg_cms_selfjoin_size", "k"),
        ("agg_countmin_topk_error", "buckets"),
        ("customer_revenue_deciles", "s"),
        ("dedup_edit_distance", "g"),
        ("dedup_edit_distance", "s"),
        ("dedup_edit_distance", "t"),
        ("dedup_group_size_histogram", "g"),
        ("dedup_group_size_histogram", "pairs"),
        ("dedup_group_size_histogram", "s"),
        ("dedup_groups", "g"),
        ("dedup_groups", "pairs"),
        ("dedup_groups", "s"),
        ("dedup_groups_star", "g"),
        ("dedup_groups_star", "pairs"),
        ("dedup_groups_star", "s"),
        ("dedup_keep_best", "edges"),
        ("dedup_keep_best", "g"),
        ("dedup_keep_best", "inter"),
        ("dedup_keep_best", "pairs"),
        ("dedup_keep_best", "rep"),
        ("dedup_keep_best", "s"),
        ("dedup_keep_best", "w"),
        ("dedup_method_agreement", "c"),
        ("dedup_method_agreement", "g"),
        ("dedup_method_agreement", "h"),
        ("dedup_method_agreement", "inter"),
        ("dedup_method_agreement", "s"),
        ("dedup_method_agreement", "sh"),
        ("dedup_method_agreement", "sig"),
        ("dedup_method_agreement", "sim"),
        ("dedup_method_agreement", "sizes"),
        ("dedup_minhash_estimate_error", "sh"),
        ("dedup_minhash_estimate_error", "sig"),
        ("dedup_minhash_estimate_error", "sizes"),
        ("dedup_minhash_pairs", "sh"),
        ("dedup_minhash_pairs", "sig"),
        ("dedup_minhash_pairs", "sizes"),
        ("dedup_ngram_jaccard", "g"),
        ("dedup_ngram_jaccard", "s"),
        ("dedup_simhash_bands", "sim"),
        ("dedup_survivorship_bias", "d"),
        ("dedup_survivorship_bias", "e"),
        ("embedding_cosine_histogram", "base"),
        ("embedding_cosine_histogram", "n"),
        ("embedding_label_centroid_sim", "n"),
        ("embedding_label_centroid_sim", "s"),
        ("events_ab_cuped", "pu"),
        ("events_active_users", "du"),
        ("events_anomaly_mad", "d"),
        ("events_anomaly_mad", "med"),
        ("events_anomaly_mad", "v"),
        ("events_autocorr_minutes", "t"),
        ("events_cusum_changepoint", "c"),
        ("events_funnel", "c"),
        ("events_funnel", "v"),
        ("events_funnel_latency", "c"),
        ("events_funnel_latency", "fu"),
        ("events_funnel_latency", "v"),
        ("events_funnel_users", "c"),
        ("events_funnel_users", "v"),
        ("events_heavy_hitters", "c"),
        ("events_interarrival_profile", "c"),
        ("events_markov_transitions", "c"),
        ("events_retention", "act"),
        ("events_runs_test", "md"),
        ("events_seasonality_profile", "c"),
        ("events_sessionized_funnel", "c"),
        ("events_sessionized_funnel", "g"),
        ("events_sessionized_funnel", "s2"),
        ("events_theil_sen_trend", "s"),
        ("events_tukey_fences", "v"),
        ("graph_copurchase_kcore_trace", "o"),
        ("graph_copurchase_kcore_trace", "tr"),
        # r13: the shared _KNN_ORACLE spec's tiny embeddings-scan CTE,
        # same conscious acceptance as every sibling consumer below
        ("graph_clustering_coefficient", "base"),
        ("graph_degree_assortativity", "base"),
        ("graph_degree_distribution", "base"),
        ("graph_degree_distribution", "e"),
        ("graph_knn_jaccard", "adj"),
        ("graph_knn_jaccard", "base"),
        ("graph_knn_jaccard", "deg"),
        ("graph_knn_jaccard", "e"),
        # base inside the embedded _KNN_ORACLE subquery: the knn wrapper
        # CTE is MATERIALIZED, so the double-inlined cast-scan runs at most
        # twice within ONE knn evaluation (the same conscious accept as
        # every other _KNN_ORACLE consumer above/below)
        ("graph_lpa_communities", "base"),
        ("graph_pagerank_knn", "base"),
        ("graph_pagerank_knn", "e"),
        ("graph_pagerank_knn", "nodes"),
        ("graph_triangle_count", "base"),
        ("graph_triangle_count", "e"),
        ("join_asof", "e"),
        ("join_time_interval", "e"),
        ("market_basket_pairs", "c"),
        ("market_basket_pairs", "o"),
        ("multimodal_join", "dims"),
        ("multimodal_phash_groups", "h"),
        ("multimodal_phash_groups", "p"),
        ("multimodal_phash_pairs", "h"),
        ("orders_benford_audit", "d"),
        ("pipeline_curriculum", "g"),
        ("pipeline_curriculum", "p"),
        ("pipeline_curriculum", "s"),
        ("pipeline_curriculum", "s3"),
        ("pipeline_dataset_build", "bench"),
        ("pipeline_dataset_build", "g"),
        ("pipeline_dataset_mix", "s"),
        ("pipeline_dedup_dataset", "edges"),
        ("pipeline_dedup_dataset", "g"),
        ("pipeline_dedup_dataset", "inter"),
        ("pipeline_dedup_dataset", "pairs"),
        ("pipeline_dedup_dataset", "rep"),
        ("pipeline_dedup_dataset", "s"),
        ("pipeline_dedup_dataset", "w"),
        ("pipeline_quality_filter", "a"),
        ("pipeline_release_diff", "d"),
        ("pipeline_token_budget", "s"),
        ("q11_important_parts", "value"),
        ("q15_top_supplier", "r"),
        ("q21_waiting_suppliers", "fl"),
        ("q2_min_cost_supplier", "offers"),
        ("sample_temperature", "c"),
        ("sample_temperature", "t"),
        ("similarity_knn_graph", "base"),
        ("similarity_quantizer_append_audit", "cut"),
        ("similarity_quantizer_append_audit", "m"),
        ("similarity_signlsh_ann", "sig"),
        ("similarity_topk_cosine", "base"),
        ("stream_asof_join", "e"),
        ("text_bloom_prefilter", "d"),
        ("text_bloom_prefilter", "mem"),
        ("text_bloom_prefilter", "mp"),
        ("text_collocations_pmi", "bn"),
        ("text_collocations_pmi", "un"),
        ("text_collocations_pmi", "w"),
        ("text_decontaminate", "bench"),
        ("text_decontaminate", "g"),
        ("text_doc_keywords", "words"),
        ("text_tfidf", "words"),
        ("text_unigram_logprob", "freq"),
        ("text_unigram_logprob", "w"),
    }
)


def test_materialized_ratchet_over_all_oracles():
    found = {
        (q, n) for q, sql in ORACLES.items() for n in _violations(sql)
    }
    new = found - _ACCEPTED
    stale = _ACCEPTED - found
    assert not new, (
        "Unmaterialized multi-ref / in-recursive CTE(s) in new oracle(s) — "
        "say AS MATERIALIZED (DuckDB re-computes inlined CTEs per "
        f"reference/iteration): {sorted(new)}"
    )
    assert not stale, (
        "Accepted-list entries no longer flagged — prune them so the "
        f"ratchet stays tight: {sorted(stale)}"
    )


def test_lint_parser_detects_multi_ref():
    sql = """
    WITH heavy AS (SELECT a, b FROM lineitem GROUP BY 1, 2),
    x AS (SELECT * FROM heavy WHERE a > 0),
    y AS (SELECT * FROM heavy WHERE b > 0)
    SELECT * FROM x JOIN y USING (a)
    """
    assert _violations(sql) == {"heavy"}


def test_lint_parser_respects_materialized():
    sql = """
    WITH heavy AS MATERIALIZED (SELECT a FROM lineitem),
    x AS (SELECT * FROM heavy), y AS (SELECT * FROM heavy)
    SELECT * FROM x UNION ALL SELECT * FROM y
    """
    assert _violations(sql) == set()


def test_lint_parser_detects_in_recursive_reference():
    sql = """
    WITH RECURSIVE seed AS (SELECT a FROM orders),
    walk AS (
      SELECT a, 0 AS d FROM seed
      UNION ALL
      SELECT w.a, w.d + 1 FROM walk w JOIN seed s ON w.a = s.a WHERE w.d < 3
    )
    SELECT * FROM walk
    """
    # seed: referenced inside recursive walk's body (re-run per iteration)
    assert _violations(sql) == {"seed"}


def test_lint_parser_detects_comma_join_tail():
    sql = """
    WITH c AS (SELECT a FROM orders)
    SELECT * FROM c x, c y WHERE x.a < y.a
    """
    assert _violations(sql) == {"c"}


def test_lint_parser_single_reference_clean():
    sql = "WITH c AS (SELECT a FROM orders) SELECT COUNT(*) FROM c"
    assert _violations(sql) == set()
