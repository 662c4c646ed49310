"""Reshaping & time-spine operators: pivot, unpivot, hourly gap-fill,
seeded sampling, approximate quantiles.

Rounding out the surface a pipeline user expects from the reference: wide↔
long reshapes are pure relational rewrites; the gap-fill spine is the
canonical time-series densification (generate spine → left join → zero-fill)
that also underpins streaming backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from paraslice_spark.functions.canon import (
    SPLIT_LABEL_SQL,
    cents,
    md5_u32,
    md5_u32_sql,
    micros_units,
    rev_cents,
    rnd,
    split_label,
)
from paraslice_spark.registry import query
from paraslice_spark.session import vocab_broadcast
from paraslice_spark.sources.io import load_tables

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "agg_pivot",
    oracle=f"""
    SELECT c_nationkey,
           {", ".join(f"COUNT(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS {s}"
                      for s in _SEGMENTS)}
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-nation customer counts by market segment (explicit value
    list so the plan needs no distinct-discovery pass — the scale rule for
    pivot). Missing combos zero-filled to match COUNT semantics."""
    c = load_tables(spark, sf_dir)["customer"]
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): two numeric part attributes to (key, attr, val)."""
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


@query(
    "events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n,
             CAST(SUM(CAST(round(value*1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
               AS sum_value
      FROM events GROUP BY 1
    )
    SELECT s.hour_start,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN agg a USING (hour_start)
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: hourly spine (sequence between observed
    bounds) left-joined to the hourly agg, gaps zero-filled. The spine is
    O(hours) — generated, never shuffled; the agg side is the usual
    partial+final hash agg."""
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_start")
    )
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(micros_units("value")).cast("double") / 1000000.0).alias("sum_value"),
    )
    return spine.join(agg, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@query("sample_bernoulli")  # rows-only: sampling RNG is engine-specific
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (~10% of orders) — reproducible within Spark
    (fixed seed), not across engines, hence rows-only."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.sample(fraction=0.1, seed=42).select("o_orderkey", "o_custkey")


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) <
          CASE WHEN o_orderpriority = '1-URGENT' THEN '8'
               WHEN o_orderpriority = '2-HIGH' THEN '4'
               ELSE '1' END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by content hash — per-class rates
    via a lexicographic threshold on md5(key): '8' keeps the 8/16 of hash
    space below it (50%), '4' → 25%, '1' → 6.25%.

    This is the reproducible curriculum-sampling primitive a training-data
    pipeline needs: the keep/drop decision is a pure function of the row
    key, so it is stable across engines, runs, repartitions, and incremental
    reprocessing — unlike RNG `sample()` (see sample_bernoulli), which is
    engine-specific. Embarrassingly parallel: a codegen'd hash + string
    compare per row, no shuffle, filter pushed to the scan."""
    o = load_tables(spark, sf_dir)["orders"]
    rate = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "8")
        .when(F.col("o_orderpriority") == "2-HIGH", "4")
        .otherwise("1")
    )
    return o.where(F.md5(F.col("o_orderkey").cast("string")) < rate).select(
        "o_orderkey", "o_orderpriority"
    )


@query("agg_approx_quantile")  # rows-only: sketch estimates are engine-specific
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch — the 100 TB
    path for quantiles (fixed-size mergeable state; the exact window
    variant in agg_percentile is for when exactness is contractual)."""
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias("approx_median"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(1000)).alias("approx_p90"),
    )


#: gap-based sessionization rule — >30-min silence opens a new session.
#: Single source (r8 review: the lag/cumsum pair was restated by three
#: declared queries and their oracles; an edit to one would silently
#: desynchronize the others' notion of "session" while each still passed
#: its own oracle).
SESSION_GAP_NS = 1_800_000_000_000

#: Oracle twin: CTE chain exposing s(user_id, event_id, event_type,
#: ts_ns, session_idx) — embed as  f"WITH {SESSIONIZE_SQL} ..."
SESSIONIZE_SQL = f"""t AS (
        SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
               CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                      OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w
                         > {SESSION_GAP_NS}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
    s AS (
        SELECT user_id, event_id, event_type, ts_ns,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY ts_ns, event_id
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_idx
        FROM t)"""


def with_session_idx(ev: DataFrame) -> DataFrame:
    """Spark twin of :data:`SESSIONIZE_SQL`: append per-user session_idx
    (lag marks session starts, a running sum numbers them — two stacked
    windows over ONE partition/order, so sessionization costs a single
    shuffle on user_id; the plan shares the sort)."""
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = (gap > SESSION_GAP_NS) | F.lag("ts_ns").over(w).isNull()
    return ev.withColumn("new_sess", new_sess.cast("int")).withColumn(
        "session_idx",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH {SESSIONIZE_SQL}
    SELECT event_id, user_id, session_idx FROM s
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based SESSIONIZATION: assign each event its per-user session ordinal
    (a new session starts after a >30-min silence).  lag() marks session
    starts, a running sum numbers them — two stacked windows over ONE
    partition/order, so the whole thing is a single shuffle on user_id
    (the plan shares the sort).  This is the per-event twin of the
    session-WINDOW aggregate (ST3): pipelines that label rows (training
    examples) need the id on each event, not just per-session rollups.
    Comparisons run on ts_ns longs — exact, no timestamp arithmetic."""
    ev = load_tables(spark, sf_dir)["events"]
    return with_session_idx(ev).select("event_id", "user_id", "session_idx")


@query(
    "sample_temperature",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT SUM(n) AS total FROM c),
    r AS (SELECT lang,
                 ROUND(power(n * 1.0 / (SELECT total FROM t), -0.5)
                       / MAX(power(n * 1.0 / (SELECT total FROM t), -0.5))
                           OVER (), 6) AS rate
          FROM c),
    th AS (SELECT lang, CAST(FLOOR(rate * 4294967296.0) AS BIGINT) AS thresh
           FROM r)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN th USING (lang)
    WHERE {md5_u32_sql("d.doc_id")} < th.thresh
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source REBALANCING (τ = 0.5) — the multi-source
    mixing step of a training-data pipeline: per-language keep-rates
    ∝ p^(τ−1) normalized so the rarest language keeps everything, so the
    sampled mix flattens toward uniform without upsampling.

    Reproducibility discipline: the keep decision is an INTEGER compare —
    the first 8 md5 hex digits of the row key as a uint32 against
    floor(rate·2³²) — so there is no float boundary for cross-engine
    last-bit noise to flip (rates are rounded(6) before scaling; pow()
    differences live at 1e-15, far below).  Plan: one tiny agg for rates
    (broadcast back), then a scan-side filter — no data shuffle at all."""
    d = load_tables(spark, sf_dir)["documents"]
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    total = c.agg(F.sum("n").alias("total"))
    w = Window.partitionBy()
    rates = (
        c.crossJoin(F.broadcast(total))
        .withColumn("raw", F.pow(F.col("n").cast("double") / F.col("total"), -0.5))
        .withColumn("rate", F.round(F.col("raw") / F.max("raw").over(w), 6))
        .withColumn("thresh", F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long"))
        .select("lang", "thresh")
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .where(md5_u32("doc_id") < F.col("thresh"))
        .select("doc_id", "lang")
    )


@query(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(epoch_ns(ts)) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
          GROUP BY e.user_id)
    SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS users FROM v
    UNION ALL SELECT 2, 'click', COUNT(*) FROM c
    UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
    ORDER BY stage
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNNEL analysis (view → click → purchase, strictly ordered in event
    time): users reaching each stage, where a stage counts only if it
    happens strictly AFTER the user's first completion of the previous
    stage — the standard product-analytics sequence query.

    All comparisons run on exact ts_ns longs (house events rule).  Plan:
    three conditional min-aggs chained by user_id equi-joins — every
    shuffle keys on user_id, so at scale the exchanges line up
    (exchange-reuse across stages) and nothing but (user_id, long) pairs
    moves after the first scan."""
    ev = load_tables(spark, sf_dir)["events"]
    # r15 examined, left alone: the repeated v/c subtrees are already
    # deduplicated by ReusedExchange (all stage shuffles key on user_id),
    # so checkpointing them only adds barriers — A/B'd and rejected
    # (old best 0.77 s vs checkpointed 0.91 s at sf0.1, both orders).
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts_ns") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts_ns") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_purchase"))
    )

    def stage(df: DataFrame, n: int, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(n).alias("stage"), F.lit(label).alias("event_type"), "users"
        )

    return (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "click"))
        .unionByName(stage(p, 3, "purchase"))
    )


@query(
    "events_retention",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id,
                        epoch_ns(ts) // 86400000000000 AS day
                 FROM events),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
    SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
           COUNT(*) AS users
    FROM act a JOIN cohort c ON a.user_id = c.user_id
    WHERE a.day - c.cohort_day BETWEEN 0 AND 7
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION — users from each first-seen-day cohort active
    again k days later (k = 0..7): the other standard product-analytics
    rollup next to events_funnel.

    Day buckets come from tz-independent ts_ns integer division (house
    events rule — to_date(ts) would shift cohorts under a different
    session timezone).  act is DISTINCT (user, day), so the per-
    (cohort, offset) count needs no countDistinct — a plain count after
    the user_id equi-join; both shuffles key on user_id then on the tiny
    (cohort_day, offset) pairs."""
    ev = load_tables(spark, sf_dir)["events"]
    day = F.expr("ts_ns div 86400000000000")
    act = ev.select("user_id", day.alias("day")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(cohort, "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .where(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("users"))
        .repartition(1)
        .sortWithinPartitions("cohort_day", "day_offset")
    )


@query(
    "events_retention_survivorship",
    oracle="""
    WITH act AS MATERIALIZED (
      SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
      FROM events),
    u AS MATERIALIZED (
      SELECT user_id, MIN(day) AS c, COUNT(*) AS nd FROM act GROUP BY 1),
    b AS (SELECT MIN(nd) AS mn, MAX(nd) AS mx FROM u),
    t AS MATERIALIZED (
      SELECT user_id, c, LEAST(2, (nd - mn) * 3 // (mx - mn + 1)) AS band
      FROM u, b),
    cs AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS cohort_n
           FROM t GROUP BY 1)
    SELECT a.day - t.c AS day_offset, t.band AS activity_band,
           MAX(cs.cohort_n) AS cohort_n,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           COUNT(*) * 1000000 // MAX(cs.cohort_n) AS retained_ppm
    FROM act a JOIN t ON a.user_id = t.user_id JOIN cs ON cs.band = t.band
    WHERE a.day - t.c BETWEEN 0 AND 7
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_retention_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION SURVIVORSHIP AUDIT — the events twin of
    :func:`paraslice_spark.operators.text.dedup_survivorship_bias`
    (VERDICT r10 next-round #3): does an activity-floor filter ("drop
    users with fewer than k active days" — the churn screen every
    engagement pipeline is tempted to apply) thin the retention curve
    UNIFORMLY, or does it inflate every point?  The cohort-retention
    rollup of events_retention, stratified by total-activity band (the
    dedup_survivorship_bias equi-width banding idiom on each user's
    distinct-active-day count — 3 bands, 1-row bounds broadcast, no
    global rank window): per (day_offset 0..7, band): cohort size,
    users active at that offset, retention in ppm.

    Measured (the finding, sf0.1): retention is MONOTONE in activity
    band at every offset — low band ~0.79-0.84, mid ~0.89-0.91, high
    ~0.94-0.96 — a 12-16 ppt spread, so ANY activity floor lifts the
    whole curve by up to ~10 ppt: retention computed on a churn-filtered
    corpus is survivorship-inflated, never comparable to the unfiltered
    number.  Non-vacuity pre-measured (the dedup_embedding_cosine
    discipline): a naive "active on the final day" survivor screen
    separates by only ~0.4 ppt on this fixture (85% of users qualify) —
    banding by total activity is what makes the audit non-vacuous.
    NOTE vs the simpler conditioning lens: the band is a function of
    the user's WHOLE history, so offset-0 rows are conditioned on the
    future — exactly the leak the audit demonstrates (that is why all
    three bands read 1.0 at offset 0 but diverge immediately after).

    EXACT INTEGERS end-to-end: tz-independent ts_ns day buckets (house
    events rule), equi-width bands on non-negative operands, retention
    as ppm integer division.

    Scale shape (r15): ONE map-combined groupBy(user).collect_set(day)
    exchange — the per-user distinct-day set is bounded by the day span
    — then everything (cohort day, activity band, the exploded offsets)
    derives without touching the facts again; bands need only a 1-row
    bounds broadcast; the final rollup is ≤24 groups, map-combined;
    cohort sizes arrive by a ≤3-row broadcast join."""
    ev = load_tables(spark, sf_dir)["events"]
    day = F.expr("ts_ns div 86400000000000")
    # r15 optimization (guide §2.4): ONE map-combined
    # groupBy(user).collect_set(day) replaces the former distinct
    # exchange + groupBy(user) exchange + act⋈bands join-back exchange —
    # the per-user distinct-day set (≤ the fixture's day span, bounded
    # by the 8-day offset window downstream) carries cohort day, band
    # input, AND the explodable activity days in one frame.
    us = (
        ev.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
        .localCheckpoint(eager=False)
    )
    u = us.select(
        "user_id",
        "days",
        F.array_min("days").alias("c"),
        F.size("days").cast("long").alias("nd"),
    )
    b = u.agg(F.min("nd").alias("mn"), F.max("nd").alias("mx"))
    band = F.least(F.lit(2), F.expr("(nd - mn) * 3 div (mx - mn + 1)"))
    t = u.crossJoin(F.broadcast(b)).select(
        "days", "c", band.alias("band")
    )
    cs = t.groupBy("band").agg(F.count(F.lit(1)).alias("cohort_n"))
    return (
        t.select("band", "c", F.explode("days").alias("day"))
        .withColumn("day_offset", F.col("day") - F.col("c"))
        .where(F.col("day_offset").between(0, 7))
        .groupBy("day_offset", "band")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(cs), "band")
        .select(
            "day_offset",
            F.col("band").alias("activity_band"),
            "cohort_n",
            "n_active",
            F.expr("n_active * 1000000 div cohort_n").alias("retained_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("day_offset", "activity_band")
    )


@query(
    "events_funnel_users",
    oracle="""
    WITH v AS (SELECT user_id, MIN(epoch_ns(ts)) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
          GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
             AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id
    """,
)
def events_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-USER funnel state (the row-level twin of events_funnel): each
    user's first view, first qualifying click, first qualifying purchase
    (all strictly ordered in event time) and the stage reached (1-3).
    This is the table a labeler joins against; the streaming state-machine
    twin is :func:`paraslice_spark.streaming.streams.stream_funnel`,
    asserted replay-equal in tests/test_streaming.py."""
    return (
        funnel_user_times(load_tables(spark, sf_dir)["events"])
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


def funnel_user_times(ev: DataFrame) -> DataFrame:
    """Core per-user funnel state build (first view / qualifying click /
    qualifying purchase + stage) — split from the declared wrapper so
    composing queries (events_funnel_latency) don't inherit the
    presentation tail's single-partition collapse (r8-continuation
    review)."""
    # r15 (guide §2.4): v and c each feed the next stage AND the final
    # left-join spine — checkpointing the (user_id, long) stage frames
    # leaves one filtered events pass per stage (was 4 scans in-plan).
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts_ns") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_click"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts_ns") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase", stage.alias("stage")
        )
    )


@query(
    "events_sessionized_funnel",
    oracle=f"""
    WITH {SESSIONIZE_SQL},
    s2 AS (SELECT user_id, event_type, ts_ns, event_id, session_idx FROM s),
    g AS (
      SELECT user_id, session_idx,
             MIN(CASE WHEN event_type = 'view' THEN ts_ns END) AS t_view
      FROM s2 GROUP BY 1, 2
    ),
    c AS (
      SELECT s2.user_id, s2.session_idx, MIN(s2.ts_ns) AS t_click
      FROM s2 JOIN g USING (user_id, session_idx)
      WHERE s2.event_type = 'click' AND s2.ts_ns > g.t_view
      GROUP BY 1, 2
    ),
    p AS (
      SELECT s2.user_id, s2.session_idx, MIN(s2.ts_ns) AS t_purchase
      FROM s2 JOIN c USING (user_id, session_idx)
      WHERE s2.event_type = 'purchase' AND s2.ts_ns > c.t_click
      GROUP BY 1, 2
    )
    SELECT g.user_id, g.session_idx, g.t_view, c.t_click, p.t_purchase,
           1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
             AS stage
    FROM g
    LEFT JOIN c ON g.user_id = c.user_id AND g.session_idx = c.session_idx
    LEFT JOIN p ON g.user_id = p.user_id AND g.session_idx = p.session_idx
    WHERE g.t_view IS NOT NULL
    ORDER BY g.user_id, g.session_idx
    """,
)
def events_sessionized_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-SESSION funnel (VERDICT r5 item #7): the funnel state machine
    scoped to a single session — first view, first strictly-later click,
    first strictly-later purchase must all land inside the SAME >30-min-gap
    session, one output row per session that opened with a view.

    Plan is the window-over-window showcase: the sessionize pair (lag +
    running sum, one shuffle on user_id) feeds THREE stacked min-windows
    over (user_id, session_idx) — t_view, then t_click conditioned on
    t_view, then t_purchase conditioned on t_click.  Spark stacks same-spec
    Window operators on one exchange+sort, so the whole funnel adds exactly
    ONE reshuffle (user_id → user_id,session_idx) after sessionization —
    no per-stage self-joins like the per-user twin needs.  The final
    per-session collapse groups on keys whose window values are
    group-constant, so first() is deterministic."""
    ev = load_tables(spark, sf_dir)["events"]
    sess = with_session_idx(
        ev.select("user_id", "event_id", "event_type", "ts_ns")
    )
    ws = Window.partitionBy("user_id", "session_idx")
    funneled = (
        sess.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts_ns"))).over(ws),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_ns") > F.col("t_view")),
                    F.col("ts_ns"),
                )
            ).over(ws),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_ns") > F.col("t_click")),
                    F.col("ts_ns"),
                )
            ).over(ws),
        )
    )
    stage = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return (
        funneled.where(F.col("t_view").isNotNull())
        .groupBy("user_id", "session_idx")
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.first("t_purchase").alias("t_purchase"),
        )
        .select("user_id", "session_idx", "t_view", "t_click", "t_purchase",
                stage.alias("stage"))
        .repartition(1)
        .sortWithinPartitions("user_id", "session_idx")
    )


@query(
    "events_topk_paths",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ns(ts), event_id)
                        AS next_type
               FROM events)
    SELECT event_type AS step_a, next_type AS step_b, COUNT(*) AS n
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, step_a, step_b
    LIMIT 10
    """,
)
def events_topk_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP EVENT-TYPE TRANSITIONS (2-step paths): per-user event sequences
    in (ts_ns, event_id) order → adjacent-type bigrams → global top-10 —
    the "common user paths" query of product analytics and the Markov-
    transition input of a behavior model.  One user_id window shuffle,
    one small transition agg; the deterministic (ts_ns, event_id) sort
    key makes the lead() assignment engine-stable."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    s = ev.select(
        F.col("event_type").alias("step_a"),
        F.lead("event_type").over(w).alias("step_b"),
    )
    return (
        s.where(F.col("step_b").isNotNull())
        .groupBy("step_a", "step_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "step_a", "step_b")
        .limit(10)
    )


@query(
    "events_streaks",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id,
                        epoch_ns(ts) // 86400000000000 AS day
                 FROM events),
    g AS (SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
          FROM act),
    s AS (SELECT user_id, COUNT(*) AS streak_len
          FROM g GROUP BY user_id, grp)
    SELECT user_id, CAST(MAX(streak_len) AS BIGINT) AS max_streak,
           COUNT(*) AS n_streaks
    FROM s GROUP BY user_id ORDER BY user_id
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: longest consecutive-day activity streak and
    streak count per user — the classic sequential-grouping pattern
    (day − row_number collapses each run of consecutive days to a
    constant group key, turning streak detection into a plain groupBy).
    Day buckets from tz-independent ts_ns division; every shuffle keys
    on user_id."""
    ev = load_tables(spark, sf_dir)["events"]
    day = F.expr("ts_ns div 86400000000000")
    act = ev.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = act.withColumn("grp", F.col("day") - F.row_number().over(w))
    s = g.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("streak_len"))
    return (
        s.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("max_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_abs,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour_abs, n,
           ROUND((n - AVG(n) OVER (PARTITION BY event_type))
                 / stddev_samp(n) OVER (PARTITION BY event_type), 4) AS z
    FROM hourly
    ORDER BY event_type, hour_abs
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOURLY ANOMALY SCORES: per-event-type z-score of each hour's volume
    against that type's own distribution — the monitoring query an events
    pipeline runs continuously (spikes/drops show as |z| > threshold; the
    threshold is the CALLER's cut so the declared output carries every
    hour, keeping row membership integer-deterministic cross-engine).

    Aggregate-then-window: the hourly rollup shuffles once on (type, hour);
    the mean/stddev window repartitions the tiny 3k-row hourly table by
    event_type.  AVG(bigint) is int/int — the identical IEEE double on
    both engines; stddev_samp agrees at the declared rnd(4) (house stats
    rule: canon.py).  Day/hour buckets from tz-independent ts_ns division
    (house events rule)."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.select("event_type", F.expr("ts_ns div 3600000000000").alias("hour_abs"))
        .groupBy("event_type", "hour_abs")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w)
    return (
        hourly.withColumn("z", F.round(z, 4))
        .repartition(1)
        .sortWithinPartitions("event_type", "hour_abs")
    )


@query(
    "sample_split_train_val_test",
    oracle=f"""
    WITH lab AS (
      SELECT lang, n_chars, {SPLIT_LABEL_SQL} AS split
      FROM documents)
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM lab GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def sample_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC TRAIN/VAL/TEST SPLIT — the pipeline's final
    partitioning step, assigned by content hash (first md5 hex digit:
    0-b → train 75%, c-d → val 12.5%, e-f → test 12.5%) so membership is a
    pure function of doc_id: stable across engines, runs, repartitions,
    and incremental re-ingests — a doc can NEVER migrate between splits
    when the corpus grows (RNG splits reshuffle everything; this is the
    same engine-portable idiom as sample_stratified_hash).  Declared
    output is the per-(split, lang) audit summary; the split column
    itself is what a real pipeline writes as a partition key.
    Embarrassingly parallel: one codegen'd md5 + two compares per row,
    one small agg shuffle."""
    d = load_tables(spark, sf_dir)["documents"]
    return (
        d.select(split_label().alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("split", "lang")
    )


#: ordinal-split bucket → label rule (same 75/12.5/12.5 proportions as the
#: content-hash split so the two methods are compared like-for-like)
_ORD_LABEL_SQL = "CASE WHEN b8 < 6 THEN 'train' WHEN b8 = 6 THEN 'val' ELSE 'test' END"


@query(
    "sample_split_stability_audit",
    oracle=f"""
    WITH d AS MATERIALIZED (SELECT doc_id FROM documents),
    cut AS (SELECT CAST(MAX(doc_id) * 4 // 5 AS BIGINT) AS cutoff FROM d),
    base AS MATERIALIZED (
      SELECT doc_id FROM d, cut WHERE doc_id <= cutoff),
    nb AS (SELECT COUNT(*) AS n FROM base),
    nf AS (SELECT COUNT(*) AS n FROM d),
    ob AS (SELECT doc_id, {_ORD_LABEL_SQL} AS lb FROM (
             SELECT doc_id,
                    (row_number() OVER (ORDER BY doc_id) - 1) * 8 // n AS b8
             FROM base, nb)),
    onew AS (SELECT doc_id, {_ORD_LABEL_SQL} AS lb FROM (
             SELECT doc_id,
                    (row_number() OVER (ORDER BY doc_id) - 1) * 8 // n AS b8
             FROM d, nf))
    SELECT 'hash' AS method, s AS from_split, s AS to_split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (SELECT {SPLIT_LABEL_SQL} AS s FROM base) GROUP BY s
    UNION ALL
    SELECT 'ordinal' AS method, ob.lb AS from_split, onew.lb AS to_split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ob JOIN onew ON ob.doc_id = onew.doc_id
    GROUP BY ob.lb, onew.lb
    ORDER BY method, from_split, to_split
    """,
)
def sample_split_stability_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-STABILITY AUDIT — the WHY behind the content-hash split rule
    (canon.split_label), measured: freeze the first 80% of the corpus as
    the "previous release" (the pipeline_release_diff cutoff idiom),
    append the rest, and count how many PREVIOUSLY-ASSIGNED docs change
    split under each of two assignment methods.  Output is the
    (method, from_split, to_split) transition table: the hash method
    contributes only diagonal rows (membership is a pure function of
    doc_id — zero moves, BY MEASUREMENT not just by construction), while
    the ordinal method (rank-percentile buckets, the "first 75% of rows
    train" rule many ad-hoc pipelines use) moves every doc whose
    percentile shifts when n grows — val/test docs silently slide into
    train, which is EVAL CONTAMINATION: yesterday's held-out documents
    become today's training data.

    Measured (sf0.01): ordinal moves 100/400 base docs (250 000 ppm) on
    a 25% corpus append — test→train 25, test→val 25, val→train 50;
    every move lands in a LOWER bucket (appends only add higher doc_ids,
    so percentiles only shrink); hash moves 0.

    Scale shape states the same lesson twice: the hash branch is one
    embarrassingly-parallel codegen pass + a 3-group agg, while the
    ordinal branch NEEDS two global rank windows (a full sort of the doc
    dimension each) — the method is unstable AND unscalable.  The audit
    pays the windows once to prove it; production uses the hash rule.
    All counts exact integers; bucket arithmetic on non-negative
    operands."""
    # the id column feeds the cutoff, the hash branch and BOTH ordinal
    # windows: checkpoint it so documents is scanned ONCE (was 6 passes)
    d = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    cut = d.agg((F.max("doc_id") * 4).cast("long").alias("m")).select(
        F.expr("m div 5").alias("cutoff")
    )
    base = d.crossJoin(F.broadcast(cut)).where(
        F.col("doc_id") <= F.col("cutoff")
    )
    hash_rows = (
        base.select(split_label().alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit("hash").alias("method"),
            F.col("s").alias("from_split"),
            F.col("s").alias("to_split"),
            "n_docs",
        )
    )

    def ordinal(df: DataFrame, bucket_col: str) -> DataFrame:
        n = df.agg(F.count(F.lit(1)).alias("n"))
        w = Window.orderBy("doc_id")
        return (
            df.crossJoin(F.broadcast(n))
            .select("doc_id", "n", F.row_number().over(w).alias("rn"))
            # integer div, never double /: (rn-1)*8/n CAST(long) truncates a
            # 5.9999999 at a bucket boundary (the FLOOR-vs-int() house trap)
            .select("doc_id", F.expr("(rn - 1) * 8 div n").alias("b8"))
            .select(
                "doc_id",
                F.when(F.col("b8") < 6, "train")
                .when(F.col("b8") == 6, "val")
                .otherwise("test")
                .alias(bucket_col),
            )
        )

    ord_rows = (
        ordinal(base, "from_split")
        .join(ordinal(d, "to_split"), "doc_id")
        .groupBy("from_split", "to_split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit("ordinal").alias("method"),
            "from_split",
            "to_split",
            "n_docs",
        )
    )
    return (
        hash_rows.unionByName(ord_rows)
        .repartition(1)
        .sortWithinPartitions("method", "from_split", "to_split")
    )


@query(
    "pipeline_token_budget",
    oracle=f"""
    WITH lab AS (
      SELECT len(string_split(text, ' ')) AS tok, n_chars,
             {SPLIT_LABEL_SQL} AS split
      FROM documents),
    s AS (
      SELECT split, COUNT(*) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM lab GROUP BY 1),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM s)
    SELECT split, n_docs, n_tokens, n_chars,
           ROUND(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS avg_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / total, 6) AS token_share
    FROM s, t ORDER BY split
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN ACCOUNTING per split — the budget table read before any
    training run ("how many tokens does my train split actually hold, and
    did the val/test carve-out drift?").  Completes the split family:
    sample_split_train_val_test audits docs per (split, lang); this audits
    the TOKEN ledger the compute budget is written in.

    Shares the canon split rule (canon.split_label — the ADVICE r7 single
    source of truth), so this table can never disagree with the split
    assignment itself.  One zero-join pass: per-row whitespace token count
    (codegen array op) → 3-group hash agg → broadcast 1-row total for the
    share.  Exact int64 sums; two IEEE divisions each → ROUND(,6)."""
    d = load_tables(spark, sf_dir)["documents"]
    split = split_label()
    s = (
        d.select(
            split.alias("split"),
            F.size(F.split("text", " ")).cast("long").alias("tok"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        # 3-row aggregate feeds both the total and the main select — one
        # scan, not two (the heavy_hitters multi-consumer pattern)
        .localCheckpoint(eager=False)
    )
    t = s.agg(F.sum("n_tokens").alias("total"))
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "split",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_docs"), 6
            ).alias("avg_tokens"),
            F.round(
                F.col("n_tokens").cast("double") / F.col("total"), 6
            ).alias("token_share"),
        )
        .repartition(1)
        .sortWithinPartitions("split")
    )


@query(
    "events_ab_test",
    oracle="""
    WITH s AS (
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
      FROM events GROUP BY 1),
    u AS (
      SELECT user_id % 2 AS variant,
             COUNT(*) AS n_users,
             COUNT(CASE WHEN np >= 10 THEN 1 END) AS n_converted
      FROM s GROUP BY 1),
    w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
             MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
             MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
             MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
      FROM u)
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(c0 AS BIGINT) AS c0,
           CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
           ROUND((c0 * 1.0 / n0), 6) AS p0,
           ROUND((c1 * 1.0 / n1), 6) AS p1,
           ROUND(((c1 * 1.0 / n1) - (c0 * 1.0 / n0))
                 / sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                        * (1.0 - ((c0 + c1) * 1.0 / (n0 + n1)))
                        * ((1.0 / n0) + (1.0 / n1))), 6) AS z_score
    FROM w
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION A/B TEST over user conversion — the experimentation
    primitive of the product-analytics family: variant = user_id parity
    (the fixture's stand-in for an assignment column), conversion = HEAVY
    PURCHASER (≥ 10 purchase events — every fixture user fires ≥ 1
    purchase, which would pin both rates at exactly 1.0 and make the
    pooled-variance z divide by zero), z = (p1−p0)/√(p̂(1−p̂)(1/n0+1/n1))
    with the pooled p̂.

    Cross-engine determinism: every input to the float formula is an
    EXACT integer count (countDistinct), and Spark and the oracle state
    the identical expression tree — each division/multiplication is then
    the same IEEE op on the same bits, so even the z-score matches at
    rnd(6) with no micro-unit machinery.  Plan: ONE user-keyed shuffle
    (the per-user purchase count, map-side combined), a 2-row variant
    agg, a 1-row projection."""
    ev = load_tables(spark, sf_dir)["events"]
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np")
    )
    u = (
        per_user.groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count(F.when(F.col("np") >= 10, 1)).alias("n_converted"),
        )
    )
    w = u.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0") * 1.0 / F.col("n0")
    p1 = F.col("c1") * 1.0 / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")) * 1.0 / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(
        pooled * (1.0 - pooled) * ((1.0 / F.col("n0")) + (1.0 / F.col("n1")))
    )
    return w.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 6).alias("p0"),
        F.round(p1, 6).alias("p1"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "events_scd2_status",
    oracle="""
    WITH t AS (
      SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
    v AS (
      SELECT user_id, event_type, ts_ns,
             CAST(SUM(chg) OVER (PARTITION BY user_id
                                 ORDER BY ts_ns, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ver
      FROM t),
    g AS (
      SELECT user_id, ver, event_type AS status,
             MIN(ts_ns) AS valid_from_ns, COUNT(*) AS n_events
      FROM v GROUP BY 1, 2, 3)
    SELECT user_id, ver, status, valid_from_ns,
           lead(valid_from_ns) OVER (PARTITION BY user_id ORDER BY ver)
             AS valid_to_ns,
           CAST(n_events AS BIGINT) AS n_events
    FROM g
    """,
)
def events_scd2_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 INTERVAL CONSTRUCTION — the warehouse pattern that turns
    an event log into a versioned dimension: each run of consecutive
    identical event_types per user is one VERSION row with
    [valid_from, valid_to) bounds; the current version's valid_to is NULL.
    The point-in-time join a consumer then runs is exactly join_asof.

    Plan: change detection (lag) + version numbering (running sum) share
    ONE user-keyed sort; the per-version rollup groups on (user, ver);
    the valid_to lead re-uses the user partitioning.  All time math on
    ts_ns longs (tz-independent, CLAUDE.md events rule); version ids are
    exact integers; NULL valid_to survives the hash as the open bound."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    chg = (
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w))
    ).cast("int")
    v = ev.withColumn("chg", chg).withColumn(
        "ver",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    g = v.groupBy("user_id", "ver", F.col("event_type").alias("status")).agg(
        F.min("ts_ns").alias("valid_from_ns"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("ver")
    return g.select(
        "user_id",
        "ver",
        "status",
        "valid_from_ns",
        F.lead("valid_from_ns").over(wv).alias("valid_to_ns"),
        "n_events",
    )


@query(
    "events_ab_cuped",
    oracle="""
    WITH pu AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value*1000000) AS BIGINT) ELSE 0 END)
                  AS DOUBLE) AS pre_u,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value*1000000) AS BIGINT) ELSE 0 END)
                  AS DOUBLE) AS post_u
      FROM events GROUP BY 1, 2),
    th AS (SELECT ROUND(regr_slope(post_u, pre_u), 6) AS theta,
                  SUM(pre_u) / COUNT(*) AS mean_pre_all FROM pu),
    v AS (SELECT variant, COUNT(*) AS n,
                 SUM(pre_u) AS sp, SUM(post_u) AS so
          FROM pu GROUP BY 1),
    w AS (SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
                 MAX(CASE WHEN variant = 1 THEN n END) AS n1,
                 MAX(CASE WHEN variant = 0 THEN sp END) AS sp0,
                 MAX(CASE WHEN variant = 1 THEN sp END) AS sp1,
                 MAX(CASE WHEN variant = 0 THEN so END) AS so0,
                 MAX(CASE WHEN variant = 1 THEN so END) AS so1
          FROM v)
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1, theta,
           ROUND(((so1 / n1) - (so0 / n0)) / 1000000.0, 6) AS raw_lift,
           ROUND((((so1 / n1) - (so0 / n0))
                  - theta * ((sp1 / n1) - (sp0 / n0))) / 1000000.0, 6)
             AS cuped_lift
    FROM w, th
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION for the A/B family (Deng et al., WSDM'13):
    the post-period per-user value is adjusted by θ × its pre-period
    value, θ = cov(post, pre)/var(pre) — which is exactly
    regr_slope(post, pre), the one moment family measured digit-for-digit
    identical across engines at rnd(6) (house canon; skew/kurtosis were
    NOT and stay banned).

    Determinism stack: per-user period sums are exact int64 micro-units
    (cast to double losslessly — bounded ≪ 2^53); θ is ROUNDED TO 6
    DIGITS FIRST, so every downstream adjustment consumes the same
    literal on both engines; variant means are exact-int divisions; both
    engines state the identical lift expressions.  Plan: one user-keyed
    shuffle (period sums), then ONE rollup(variant) over the per-user
    rows — the grand-total row carries θ (regr_slope over all users),
    the two variant rows carry the n/Σpre/Σpost sums — pivoted by a
    3-row conditional agg.  pu is consumed exactly once, so events is
    scanned once with NO persist (the r6 shape persisted pu and leaked
    an InMemoryRelation into the session cache manager per invocation —
    ADVICE r6; the rollup removes the double-consumption instead of
    caching around it)."""
    ev = load_tables(spark, sf_dir)["events"]
    cut = F.lit("2024-01-16").cast("timestamp")
    pu = ev.groupBy("user_id", (F.col("user_id") % 2).alias("variant")).agg(
        F.sum(F.when(F.col("ts") < cut, micros_units("value")).otherwise(0))
        .cast("double")
        .alias("pre_u"),
        F.sum(F.when(F.col("ts") >= cut, micros_units("value")).otherwise(0))
        .cast("double")
        .alias("post_u"),
    )
    r = pu.rollup("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_u").alias("sp"),
        F.sum("post_u").alias("so"),
        F.round(F.regr_slope("post_u", "pre_u"), 6).alias("slope"),
        F.grouping("variant").alias("is_total"),
    )
    w = r.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("sp"))).alias("sp0"),
        F.max(F.when(F.col("variant") == 1, F.col("sp"))).alias("sp1"),
        F.max(F.when(F.col("variant") == 0, F.col("so"))).alias("so0"),
        F.max(F.when(F.col("variant") == 1, F.col("so"))).alias("so1"),
        F.max(F.when(F.col("is_total") == 1, F.col("slope"))).alias("theta"),
    )
    post_diff = (F.col("so1") / F.col("n1")) - (F.col("so0") / F.col("n0"))
    pre_diff = (F.col("sp1") / F.col("n1")) - (F.col("sp0") / F.col("n0"))
    return w.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        "theta",
        F.round(post_diff / 1000000.0, 6).alias("raw_lift"),
        F.round(
            (post_diff - F.col("theta") * pre_diff) / 1000000.0, 6
        ).alias("cuped_lift"),
    )


@query(
    "events_forecast_backtest",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1),
    pred AS (
      SELECT h, n, lag(n, 24) OVER (ORDER BY h) AS yhat
      FROM hourly)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(ABS(n - yhat)) AS BIGINT) AS sum_abs_err,
           CAST(SUM(ABS(n - yhat)) AS DOUBLE) / COUNT(*) AS mae,
           ROUND(CAST(SUM(ABS(n - yhat)) AS DOUBLE) / SUM(n), 6)
             AS wape
    FROM pred WHERE yhat IS NOT NULL
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-NAIVE FORECAST BACKTEST — the time-series baseline every
    forecasting pipeline reports first: ŷ(h) = y(h − 24h) (same hour
    yesterday), scored with MAE and WAPE over the hourly event counts.

    Every error term is an exact integer (|count − lagged count|), so the
    aggregate metrics are exact-int divisions — fully deterministic with
    no micro-unit machinery.  Plan: one hour-truncated agg (map-side
    combined), ONE global-ordered lag window over the O(hours) series —
    tiny by construction (the fixture spans one month: ~720 rows; a year
    is 8 760), so the single-partition window is the right plan at any
    corpus size; per-series forecasting at scale partitions the window by
    series key instead."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("h")
    pred = hourly.withColumn("yhat", F.lag("n", 24).over(w)).where(
        F.col("yhat").isNotNull()
    )
    abs_err = F.sum(F.abs(F.col("n") - F.col("yhat")))
    return pred.agg(
        F.count(F.lit(1)).alias("n_hours"),
        abs_err.alias("sum_abs_err"),
        (abs_err.cast("double") / F.count(F.lit(1))).alias("mae"),
        F.round(abs_err.cast("double") / F.sum("n"), 6).alias("wape"),
    )


@query(
    "events_forecast_backtest_by_type",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    pred AS (
      SELECT event_type, h, n,
             lag(n, 24) OVER (PARTITION BY event_type ORDER BY h) AS yhat
      FROM hourly)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(ABS(n - yhat)) AS BIGINT) AS sum_abs_err,
           CAST(SUM(ABS(n - yhat)) AS DOUBLE) / COUNT(*) AS mae,
           ROUND(CAST(SUM(ABS(n - yhat)) AS DOUBLE) / SUM(n), 6) AS wape
    FROM pred WHERE yhat IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_forecast_backtest_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SERIES seasonal-naive backtest — the at-scale shape
    events_forecast_backtest's docstring promises: the lag window is
    PARTITIONED BY the series key, so a million independent series
    backtest in parallel with no global-ordered window anywhere (each
    task sorts only its series' O(hours) counts; the global variant's
    single-partition window is only right when there IS one series).

    Same determinism stack as the parent: every error term is an exact
    integer |count − lagged count|, metrics are exact-int divisions.
    lag(24) is a ROW lag over each series' observed hours (identical
    semantics both engines; sparse series lag across gaps — the declared
    contract is the seasonal-naive baseline on observed points)."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    pred = hourly.withColumn("yhat", F.lag("n", 24).over(w)).where(
        F.col("yhat").isNotNull()
    )
    abs_err = F.sum(F.abs(F.col("n") - F.col("yhat")))
    return (
        pred.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            abs_err.alias("sum_abs_err"),
            (abs_err.cast("double") / F.count(F.lit(1))).alias("mae"),
            F.round(abs_err.cast("double") / F.sum("n"), 6).alias("wape"),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


_CHI2_TYPES = ("click", "error", "purchase", "signup", "view")


def _chi2_oracle() -> str:
    cells = ",\n           ".join(
        f"CAST(COUNT(CASE WHEN event_type = '{t}' AND user_id % 2 = {v} "
        f"THEN 1 END) AS DOUBLE) AS o_{t}_{v}"
        for t in _CHI2_TYPES
        for v in (0, 1)
    )
    rows = {t: f"(o_{t}_0 + o_{t}_1)" for t in _CHI2_TYPES}
    cols = {
        v: "(" + " + ".join(f"o_{t}_{v}" for t in _CHI2_TYPES) + ")"
        for v in (0, 1)
    }
    n = "(" + " + ".join(rows.values()) + ")"
    terms = " + ".join(
        f"((o_{t}_{v} - ({rows[t]} * {cols[v]}) / {n})"
        f" * (o_{t}_{v} - ({rows[t]} * {cols[v]}) / {n}))"
        f" / (({rows[t]} * {cols[v]}) / {n})"
        for t in _CHI2_TYPES
        for v in (0, 1)
    )
    return f"""
    WITH w AS (SELECT {cells} FROM events)
    SELECT CAST({n} AS BIGINT) AS n_events,
           ROUND({terms}, 6) AS chi2,
           CAST({(len(_CHI2_TYPES) - 1)} AS BIGINT) AS dof
    FROM w
    """


@query("events_chi2_independence", oracle=_chi2_oracle())
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE TEST of event_type × variant — the
    categorical counterpart of events_ab_test: does the event-type mix
    differ between the two assignment groups?

    Determinism by FIXED-ORDER ENUMERATION (the q19 explicit-branch
    idea applied to a statistic): the 5×2 contingency cells are ten
    NAMED columns of one conditional-agg row, and χ² is written as the
    same literal left-to-right sum of ten (o−e)²/e terms in BOTH engines
    — no engine-ordered float reduction anywhere, so the statistic
    hash-matches at rnd(6).  Observed counts are exact ints; expected
    values are single IEEE ops on exact ints.  One scan, one 1-row agg."""
    ev = load_tables(spark, sf_dir)["events"]
    cells = ev.agg(
        *[
            F.count(
                F.when(
                    (F.col("event_type") == t) & (F.col("user_id") % 2 == v), 1
                )
            )
            .cast("double")
            .alias(f"o_{t}_{v}")
            for t in _CHI2_TYPES
            for v in (0, 1)
        ]
    )
    rows = {t: sum(F.col(f"o_{t}_{v}") for v in (0, 1)) for t in _CHI2_TYPES}
    cols = {
        v: sum(F.col(f"o_{t}_{v}") for t in _CHI2_TYPES) for v in (0, 1)
    }
    n = sum(rows.values())
    chi2 = None
    for t in _CHI2_TYPES:
        for v in (0, 1):
            e = (rows[t] * cols[v]) / n
            term = ((F.col(f"o_{t}_{v}") - e) * (F.col(f"o_{t}_{v}") - e)) / e
            chi2 = term if chi2 is None else chi2 + term
    return cells.select(
        n.cast("long").alias("n_events"),
        F.round(chi2, 6).alias("chi2"),
        F.lit(len(_CHI2_TYPES) - 1).cast("long").alias("dof"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ns(ts), event_id)
               AS prev_type
      FROM events),
    c AS (SELECT prev_type AS from_type, event_type AS to_type,
                 COUNT(*) AS n
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT from_type, SUM(n) AS row_n FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / row_n, 6) AS p
    FROM c JOIN r ON r.from_type = c.from_type
    ORDER BY c.from_type, c.to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER MARKOV TRANSITION MATRIX of event types — the sequence
    model behind next-event prediction and anomaly scoring (the
    probability twin of events_topk_paths' raw counts).

    One user-keyed lag window (ns-exact ordering), a (from, to) count
    agg, and per-row normalization by the from-row total — exact integer
    counts, one rounded division per cell, ≤ |types|² output rows."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    r = c.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return (
        c.join(F.broadcast(r), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
        )
        .repartition(1)
        .sortWithinPartitions("from_type", "to_type")
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS money_c
      FROM orders GROUP BY 1),
    scored AS (
      SELECT ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY freq, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY money_c, o_custkey) AS m_score
      FROM base)
    SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
    FROM scored GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — recency/frequency/monetary quartiles, the
    classic customer-analytics bucketing.  Determinism: every ntile
    ORDER BY carries o_custkey as the tiebreak, so quartile assignment
    is a total order in both engines; monetary is exact integer cents.
    Declared output is the 4×4×4 segment census.  Plan note: the three
    global ntiles are single-partition windows over the O(customers)
    aggregate — at 100 TB swap ntile for threshold joins against
    approx-quantile cut points (documented tradeoff; exactness is the
    declared contract here)."""
    o = load_tables(spark, sf_dir)["orders"]
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(cents("o_totalprice")).alias("money_c"),
    )
    scored = base.select(
        F.ntile(4).over(Window.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy("freq", "o_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("money_c", "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .repartition(1)
        .sortWithinPartitions("r_score", "f_score", "m_score")
    )


@query(
    "part_abc_analysis",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_c2
      FROM lineitem GROUP BY 1),
    ranked AS (
      SELECT l_partkey, rev_c2,
             SUM(rev_c2) OVER (ORDER BY rev_c2 DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS cum_c2,
             SUM(rev_c2) OVER () AS total_c2
      FROM rev)
    SELECT CASE WHEN cum_c2 * 100 <= total_c2 * 80 THEN 'A'
                WHEN cum_c2 * 100 <= total_c2 * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c2) AS DOUBLE) / 10000.0 AS revenue
    FROM ranked GROUP BY 1 ORDER BY 1
    """,
)
def part_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / PARETO ANALYSIS of part revenue — the 80/15/5 inventory
    classification: parts are ranked by revenue, classified by their
    CUMULATIVE share (A ≤ 80%, B ≤ 95%, C rest).

    Determinism: the running sum is over exact int64 cents² with a total
    order (rev DESC, partkey), and the class cut compares integers via
    cross-multiplication (cum*100 ≤ total*80 — int64-safe here; scale
    the cents unit down before the multiply if Σrev_c2 ever approaches
    2^57) — no float share is ever computed.  Plan: one per-part agg
    shuffle, a single-partition ranked cumsum over O(parts) rows (swap
    to a two-pass partition-offset cumsum at catalog scale), a 3-row
    census."""
    li = load_tables(spark, sf_dir)["lineitem"]
    rev = li.groupBy("l_partkey").agg(F.sum(rev_cents()).alias("rev_c2"))
    w = Window.orderBy(F.desc("rev_c2"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.select(
        "rev_c2",
        F.sum("rev_c2").over(w).alias("cum_c2"),
        F.sum("rev_c2").over(Window.partitionBy()).alias("total_c2"),
    )
    abc = (
        F.when(F.col("cum_c2") * 100 <= F.col("total_c2") * 80, "A")
        .when(F.col("cum_c2") * 100 <= F.col("total_c2") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.groupBy(abc.alias("abc_class"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum("rev_c2").cast("double") / 10000.0).alias("revenue"),
        )
        .repartition(1)
        .sortWithinPartitions("abc_class")
    )


@query(
    "supplier_scorecard",
    oracle="""
    WITH li AS (
      SELECT l_suppkey,
             COUNT(*) AS n_lines,
             COUNT(DISTINCT l_partkey) AS n_parts,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_c2,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
      FROM lineitem GROUP BY 1)
    SELECT s_suppkey, s_name, n_name AS nation,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_parts AS BIGINT) AS n_parts,
           CAST(rev_c2 AS DOUBLE) / 10000.0 AS revenue,
           ROUND(CAST(n_returned AS DOUBLE) / n_lines, 6) AS return_rate
    FROM li JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
    ORDER BY s_suppkey
    """,
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLIER SCORECARD — the procurement dashboard row: per-supplier
    volume, part breadth, discounted revenue, and return rate (the
    fixture's lineitem has no commit/receipt dates, so the classic
    on-time metric is out of reach — documented adaptation, same policy
    as the q21 rewrite).

    One fact pass: a single supplier-keyed hash agg (count, distinct
    parts, exact cents² revenue, conditional return count) — the fact
    table never joins anything.  The supplier and nation dims broadcast
    onto the |suppliers|-sized aggregate afterwards.  return_rate is one
    IEEE division of two exact counts → ROUND(,6) engine-stable."""
    t = load_tables(spark, sf_dir)
    li = (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(rev_cents()).alias("rev_c2"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias(
                "n_returned"
            ),
        )
    )
    return (
        li.join(
            F.broadcast(t["supplier"]),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            "n_lines",
            "n_parts",
            (F.col("rev_c2").cast("double") / 10000.0).alias("revenue"),
            F.round(
                F.col("n_returned").cast("double") / F.col("n_lines"), 6
            ).alias("return_rate"),
        )
        .repartition(1)
        .sortWithinPartitions("s_suppkey")
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH o AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 COUNT(*) AS support
          FROM o a JOIN o b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
    c AS (SELECT l_partkey, COUNT(*) AS cnt FROM o GROUP BY 1),
    t AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM o)
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           ROUND(CAST(n_orders * support AS DOUBLE)
                 / (ca.cnt * cb.cnt), 6) AS lift
    FROM p JOIN c ca ON ca.l_partkey = part_a
           JOIN c cb ON cb.l_partkey = part_b, t
    ORDER BY support DESC, part_a, part_b LIMIT 20
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET pair mining (the Apriori k=2 support/lift table) —
    the classic co-occurrence analysis over order baskets: which part
    pairs land in the same order more often than independence predicts.

    Scale shape: pairs fan out only WITHIN each basket (collect_set per
    order, double explode, a<b orientation halves it), so the pair count
    is Σ |basket|² with TPC-H baskets ≤ 7 lines — linear in orders, not
    |parts|² — and the fact table pays exactly ONE exchange (the
    map-combined collect_set groupBy; r15 removed the former distinct +
    self-join exchanges, guide §2.4).  The per-part item-count table is CATALOG-sized (SF-linear
    in TPC-H), so its joins go through the gated vocab_broadcast
    (VERDICT r9) — plain equi-joins by default, AQE promotes when it
    fits.  lift = N·supp(ab)/(cnt(a)·cnt(b)) is ONE IEEE
    division of two exact int64 products → ROUND(,6) is engine-stable
    (house micro-unit precedent).  Top-20 by (support DESC, part_a,
    part_b) — a total order, so the LIMIT boundary is tie-free —
    executes as TakeOrderedAndProject, never a global sort."""
    li = load_tables(spark, sf_dir)["lineitem"]
    # r15 optimization (guide §2.4): one groupBy(l_orderkey) collect_set
    # replaces the former distinct + two-sided self-join — the basket
    # array (≤7 parts in TPC-H) IS the per-order pair generator, so the
    # fact table crosses the wire once (map-side partial collect_set
    # dedupes in place) instead of three times (distinct exchange + both
    # self-join exchanges).  The basket table feeds three subplans
    # (pairs, item counts, basket total) — non-eager localCheckpoint
    # materializes it once (persist-hygiene pattern, CLAUDE.md).
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .localCheckpoint(eager=False)
    )
    p = (
        baskets.select("ps", F.explode("ps").alias("part_a"))
        .select("part_a", F.explode("ps").alias("part_b"))
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    c = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        p.join(
            vocab_broadcast(c.select(F.col("l_partkey").alias("part_a"),
                                     F.col("cnt").alias("cnt_a"))),
            "part_a",
        )
        .join(
            vocab_broadcast(c.select(F.col("l_partkey").alias("part_b"),
                                     F.col("cnt").alias("cnt_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(t))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                (F.col("n_orders") * F.col("support")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "events_active_users",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                FROM events),
    spine AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY 1),
    wau AS (SELECT s.day, COUNT(DISTINCT u.user_id) AS wau
            FROM spine s JOIN du u
              ON u.day <= s.day AND u.day >= s.day - INTERVAL 6 DAY
            GROUP BY 1)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, CAST(dau AS BIGINT) AS dau,
           CAST(wau AS BIGINT) AS wau,
           ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    ORDER BY day
    """,
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / STICKINESS — the product-health trio: daily active
    users, trailing-7-day active users, and their ratio (DAU/WAU, the
    classic engagement metric).

    Scale shape: deduplicate to (day, user) FIRST (one shuffle, the
    only pass over raw events), then each (day, user) row EXPLODES into
    its 7 covered spine days before the per-day distinct count (r15: a
    deterministic sequence explode — the former broadcast range join
    against the day spine did the same ≤7× fan-out but paid a
    nested-loop predicate per (row, spine-day) pair; phantom days past
    the range are culled by the dau inner join).  Never
    a running `countDistinct` window (unbounded state) and never a
    per-user sort.  stickiness is one IEEE division of two exact counts
    → ROUND(,6) engine-stable.  The day is EMITTED AS A STRING: a DATE
    output column round-trips differently through the two engines'
    pandas paths (DuckDB DATE → datetime64 midnight, Spark DATE →
    datetime.date), and a date→timestamp cast would be session-tz
    dependent (the r3 NTZ lesson) — yyyy-MM-dd formatting of the
    NTZ-derived date is tz-independent on both."""
    ev = load_tables(spark, sf_dir)["events"]
    # du feeds three subplans (spine, dau, wau — no shared subplan): one
    # materialization instead of three fact scans (persist-hygiene pattern)
    du = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # r15 optimization: each (day, user) row serves exactly the 7 spine
    # days [day, day+6] — a deterministic explode of that interval
    # replaces the former broadcast-nested-loop range join against the
    # day spine (same ≤7× fan-out, zero join predicate evaluations;
    # guide §3).  Phantom spine days past the observed range are culled
    # by the final inner join with dau (= observed days), exactly the
    # spine membership the range join enforced.
    wau = (
        du.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("day")
    )


@query(
    "events_heavy_hitters",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS share
    FROM c, t ORDER BY n DESC, user_id LIMIT 20
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT HEAVY HITTERS — the skew diagnostic run before choosing a
    partitioning strategy (join_salted_skew's R and AQE's skew thresholds
    are calibrated from exactly this table): the top-20 keys by event
    count with their traffic share.

    One hash agg over the facts (map-side combined: the shuffle carries
    one row per (partition, user)), a 1-row total broadcast, and a
    TakeOrderedAndProject top-20 — never a global sort.  (n DESC,
    user_id) is a total order → tie-free LIMIT.  share is one IEEE
    division of exact counts → ROUND(,6) engine-stable."""
    ev = load_tables(spark, sf_dir)["events"]
    # c feeds both the total and the main path (no shared subplan) — one
    # materialization instead of two fact scans (persist-hygiene pattern)
    c = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(20)
    )


@query(
    "customer_ltv_cohorts",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS mi,
             CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c
      FROM orders),
    cm AS (SELECT o_custkey, mi, CAST(SUM(rev_c) AS BIGINT) AS rev_c
           FROM m GROUP BY 1, 2),
    j AS (SELECT o_custkey, rev_c,
                 MIN(mi) OVER (PARTITION BY o_custkey) AS m0,
                 mi - MIN(mi) OVER (PARTITION BY o_custkey) AS k
          FROM cm),
    g AS (SELECT m0, k, COUNT(*) AS n_active,
                 CAST(SUM(rev_c) AS BIGINT) AS rev_c
          FROM j GROUP BY 1, 2),
    w AS (SELECT m0, k, n_active, rev_c,
                 CAST(SUM(rev_c) OVER (PARTITION BY m0 ORDER BY k)
                      AS BIGINT) AS cum_c,
                 MAX(CASE WHEN k = 0 THEN n_active END)
                   OVER (PARTITION BY m0) AS cohort_size
          FROM g)
    SELECT CAST((m0 - 1) // 12 AS BIGINT) AS cohort_year,
           CAST((m0 - 1) % 12 + 1 AS BIGINT) AS cohort_month,
           k, CAST(n_active AS BIGINT) AS n_active,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           ROUND(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention,
           ROUND(CAST(cum_c AS DOUBLE) / (cohort_size * 100.0), 6)
             AS cum_ltv_per_customer
    FROM w ORDER BY cohort_year, cohort_month, k
    """,
)
def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV TRIANGLE — customers grouped by first-order month, then
    per (cohort, months-since-first-order): active customers, revenue,
    retention, and CUMULATIVE LIFETIME VALUE per cohort member.  The table
    every subscription/commerce dashboard opens with, and the one BI shape
    the repo lacked next to events_retention (activity retention on
    events) and customer_revenue_deciles (cross-sectional concentration):
    LTV is LONGITUDINAL — it follows each acquisition cohort forward.

    Exactness: calendar math stays INTEGER end-to-end (month index
    mi = year·12 + month on the NTZ timestamp — the scalar_datetime_pack
    precedent; cohort age k = mi − m0; year/month recovered by exact
    div/mod), revenue is exact int64 cents, and each ratio is ONE IEEE
    division of exact integers → ROUND(,6) engine-stable
    (cohort_size·100 stays int64, so cum LTV divides once, not twice).

    Scale shape: orders hash-reduce to (customer, month) — bounded by
    |customers|·months, not |orders| — then m0 comes from a window
    PARTITIONED by customer (one co-partitioned shuffle, no join back),
    the cohort agg is cardinality-bounded (months² triangle ≈ thousands
    of rows at any corpus size), and both report windows partition by
    cohort over that tiny table.  n_active needs no DISTINCT: (customer,
    month) is unique by construction after the first agg."""
    o = load_tables(spark, sf_dir)["orders"]
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
        cents("o_totalprice").alias("rev_c"),
    )
    cm = m.groupBy("o_custkey", "mi").agg(F.sum("rev_c").alias("rev_c"))
    wc = Window.partitionBy("o_custkey")
    j = cm.select(
        "rev_c",
        F.min("mi").over(wc).alias("m0"),
        (F.col("mi") - F.min("mi").over(wc)).alias("k"),
    )
    g = j.groupBy("m0", "k").agg(
        F.count(F.lit(1)).alias("n_active"), F.sum("rev_c").alias("rev_c")
    )
    wk = (
        Window.partitionBy("m0")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("m0")
    w = g.select(
        "m0",
        "k",
        "n_active",
        "rev_c",
        F.sum("rev_c").over(wk).alias("cum_c"),
        F.max(F.when(F.col("k") == 0, F.col("n_active")))
        .over(wp)
        .alias("cohort_size"),
    )
    return (
        w.select(
            F.expr("(m0 - 1) div 12").alias("cohort_year"),
            ((F.col("m0") - 1) % 12 + 1).alias("cohort_month"),
            "k",
            "n_active",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
            F.round(
                F.col("cum_c").cast("double")
                / (F.col("cohort_size") * 100.0),
                6,
            ).alias("cum_ltv_per_customer"),
        )
        .repartition(1)
        .sortWithinPartitions("cohort_year", "cohort_month", "k")
    )


@query(
    "customer_revenue_deciles",
    oracle="""
    WITH s AS (SELECT o_custkey,
                      SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS spend_c
               FROM orders GROUP BY 1),
    d AS (SELECT spend_c,
                 ntile(10) OVER (ORDER BY spend_c DESC, o_custkey) AS decile
          FROM s),
    t AS (SELECT CAST(SUM(spend_c) AS BIGINT) AS total FROM s)
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(spend_c) AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
           ROUND(CAST(CAST(SUM(spend_c) AS BIGINT) AS DOUBLE) / total, 6)
             AS revenue_share
    FROM d, t GROUP BY decile, total ORDER BY decile
    """,
)
def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE CONCENTRATION (Lorenz deciles) — "the top 10% of customers
    carry X% of revenue", the BI counterpart of part_abc_analysis on the
    customer axis.

    r8 re-plan (VERDICT r7 "what's wrong"): the oracle's ntile(10) OVER
    (ORDER BY spend DESC, custkey) is reproduced WITHOUT any unpartitioned
    window via TWO-LEVEL RANKING — the distributed global-rank shape:

    1. coarse VALUE buckets from broadcast approx-quantile cuts (bucket =
       #cuts above spend; value-contiguous in the DESC order, so ties —
       same spend — always land in ONE bucket and the custkey tie-break
       stays bucket-local);
    2. row_number PARTITIONED BY bucket (each task sorts ~N/B rows);
    3. bucket offsets from the ≤B-row bucket-count table by a broadcast
       triangle self-join (off_b = Σ counts of buckets above) — NO window
       at all on the tiny table, so the plan test can assert "every Window
       is partitioned";
    4. global rank = offset + in-bucket rank, decile by the closed-form
       ntile split (first n%10 tiles get ⌈N/10⌉ rows).

    Cut VALUES are approximate (percentile_approx sketch) but the rank is
    EXACT for any cuts — bucketing only affects balance, never order —
    so the output hash-matches the ntile oracle.  Spend sums are exact
    int64 cents, shares one IEEE division each → ROUND(,6).  At 100× the
    only data-sized sorts are the B partitioned bucket sorts."""
    n_buckets = 32  # B coarse buckets -> 31 interior quantile cuts
    o = load_tables(spark, sf_dir)["orders"]
    # s feeds the cuts sketch, the bucketing pass and the grand total (no
    # shared subplan) — one materialization instead of three fact scans
    s = (
        o.groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("spend_c"))
        .localCheckpoint(eager=False)
    )
    fracs = F.array(
        *[F.lit(k / n_buckets) for k in range(1, n_buckets)]
    )
    cuts = s.agg(
        F.percentile_approx("spend_c", fracs, 10_000).alias("cuts")
    )
    b = (
        s.crossJoin(F.broadcast(cuts))
        .select(
            "o_custkey",
            "spend_c",
            F.expr("size(filter(cuts, c -> c > spend_c))").alias("bkt"),
        )
        .localCheckpoint(eager=False)  # one bucketing pass feeds rank + counts
    )
    w = Window.partitionBy("bkt").orderBy(F.desc("spend_c"), "o_custkey")
    r = b.select("spend_c", "bkt", F.row_number().over(w).alias("rn"))
    bc = b.groupBy("bkt").agg(F.count(F.lit(1)).alias("bn"))
    pred = bc.select(F.col("bkt").alias("pbkt"), F.col("bn").alias("pbn"))
    off = (
        bc.join(F.broadcast(pred), F.col("pbkt") < F.col("bkt"), "left")
        .groupBy("bkt")
        .agg(F.coalesce(F.sum("pbn"), F.lit(0)).alias("off"))
    )
    t = s.agg(
        F.sum("spend_c").alias("total"), F.count(F.lit(1)).alias("n_cust")
    )
    # closed-form ntile(10): q = N div 10, rem = N mod 10; tiles 1..rem hold
    # q+1 rows.  rem = 0 makes the when-branch unreachable (grank > 0), and
    # non-ANSI integer `div 0` is null-safe anyway.
    decile = F.expr(
        """
        CASE WHEN grank <= (n_cust % 10) * (n_cust div 10 + 1)
             THEN (grank + n_cust div 10) div (n_cust div 10 + 1)
             ELSE n_cust % 10
                  + (grank - (n_cust % 10) * (n_cust div 10 + 1)
                     + n_cust div 10 - 1) div (n_cust div 10)
        END
        """
    ).cast("int")
    g = (
        r.join(F.broadcast(off), "bkt")
        .select("spend_c", (F.col("off") + F.col("rn")).alias("grank"))
        .crossJoin(F.broadcast(t))
        .select("spend_c", "total", decile.alias("decile"))
    )
    return (
        g.groupBy("decile", "total")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_c").alias("dec_c"),
        )
        .select(
            "decile",
            "n_customers",
            (F.col("dec_c").cast("double") / 100.0).alias("revenue"),
            F.round(
                F.col("dec_c").cast("double") / F.col("total"), 6
            ).alias("revenue_share"),
        )
        .repartition(1)
        .sortWithinPartitions("decile")
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value*1000000) AS BIGINT) AS mv
      FROM events),
    r1 AS (
      SELECT event_type, mv,
             row_number() OVER (PARTITION BY event_type ORDER BY mv) - 1 AS i,
             COUNT(*) OVER (PARTITION BY event_type) - 1 AS m
      FROM v),
    med AS (
      SELECT event_type,
             SUM(CASE WHEN i = m // 2 THEN mv END)
             + SUM(CASE WHEN i = (m + 1) // 2 THEN mv END) AS med2,
             COUNT(*) AS n
      FROM r1 GROUP BY 1),
    d AS (
      SELECT v.event_type, ABS(2 * mv - med2) AS dev
      FROM v JOIN med USING (event_type)),
    r2 AS (
      SELECT event_type, dev,
             row_number() OVER (PARTITION BY event_type ORDER BY dev) - 1 AS i,
             COUNT(*) OVER (PARTITION BY event_type) - 1 AS m
      FROM d),
    mad AS (
      SELECT event_type,
             SUM(CASE WHEN i = m // 2 THEN dev END)
             + SUM(CASE WHEN i = (m + 1) // 2 THEN dev END) AS mad2
      FROM r2 GROUP BY 1)
    SELECT med.event_type, CAST(n AS BIGINT) AS n,
           CAST(med2 AS DOUBLE) / 2000000.0 AS median_value,
           CAST(mad2 AS DOUBLE) / 4000000.0 AS mad_value,
           CAST((SELECT COUNT(*) FROM d
                 WHERE d.event_type = med.event_type
                   AND 2 * dev > 3 * mad2) AS BIGINT) AS n_outliers
    FROM med JOIN mad ON mad.event_type = med.event_type
    ORDER BY med.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST OUTLIER DETECTION via median / MAD — the resistant
    counterpart of events_anomaly_zscore (one wild value shifts a mean
    and explodes a stddev; the median/MAD pair shrugs).

    EXACT-INTEGER MEDIANS: values are micro-unit int64; a median is kept
    as med2 = v[⌊h⌋] + v[⌈h⌉] (TWICE the median — an exact integer even
    when n is even), deviations as dev = |2v − med2| (= 2×|v − median|),
    the MAD as mad2 = dev[⌊h⌋] + dev[⌈h⌉] (= 4×MAD), and the outlier
    cut |v − median| > 3×MAD becomes the INTEGER comparison
    2·dev > 3·mad2 — no float enters until the two final display
    divisions.

    VALUE-HISTOGRAM SELECTION (VERDICT r6 re-plan): the r6 shape ran TWO
    ``Window.partitionBy(event_type)`` sort windows over the RAW rows
    with |event_type| = 5 — at 100× each task sorts ~N/5 rows twice, the
    exact skew funnel the r4 window_range_frame fix removed.  Micro-unit
    values live in a SATURATING domain (measured: 6.6k distinct @ 10k
    rows, 17.8k @ 100k — the quantized float range, not N), so instead:
    ONE parallel hash agg builds per-(event_type, mv) counts; the sorted
    position ⌊h⌋/⌈h⌉ values are then selected by CUMULATIVE COUNT over
    the per-type DISTINCT-value list (a domain-bounded window — the
    value whose [cum−cnt, cum) range covers the target index is the
    order statistic, tie-free by construction).  Each median is computed
    as a WINDOW VALUE (per-partition conditional sum), not a grouped agg
    joined back — so the dev histogram derives from the same rows, the
    outlier cut compares against the windowed mad2 in place, and the raw
    table is hash-aggregated EXACTLY ONCE with no self-joins (the
    join-back form re-ran the histogram subtree ~7×; measured 1.9 s →
    this shape at sf0.1).  No per-row sort anywhere in the plan
    (asserted: tests/test_plans.py::test_anomaly_mad_windows_run_on_
    histogram)."""
    ev = load_tables(spark, sf_dir)["events"]
    hist = (
        ev.select("event_type", micros_units("value").alias("mv"))
        .groupBy("event_type", "mv")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def with_median2(h: DataFrame, col: str, out: str) -> DataFrame:
        """Attach the per-type doubled median of ``col`` (count-weighted)
        as a window value — every row keeps flowing, nothing joins back.
        Also leaves ``_tot`` (the per-type count mass) for the caller."""
        w = Window.partitionBy("event_type").orderBy(col)
        wp = Window.partitionBy("event_type")
        r = h.select(
            "*",
            F.sum("cnt").over(w).alias("_cum"),
            F.sum("cnt").over(wp).alias("_tot"),
        )
        lo = F.col("_cum") - F.col("cnt")  # first sorted index held by col
        p1 = F.expr("(_tot - 1) div 2")
        p2 = F.expr("_tot div 2")
        sel1 = F.when((lo <= p1) & (p1 < F.col("_cum")), F.col(col))
        sel2 = F.when((lo <= p2) & (p2 < F.col("_cum")), F.col(col))
        return r.select(
            "*",
            (F.sum(sel1).over(wp) + F.sum(sel2).over(wp)).alias(out),
        ).drop("_cum")

    d = with_median2(hist, "mv", "med2").select(
        "event_type",
        F.col("_tot").alias("n"),
        "med2",
        F.abs(2 * F.col("mv") - F.col("med2")).alias("dev"),
        "cnt",
    )
    dev_hist = d.groupBy("event_type", "n", "med2", "dev").agg(
        F.sum("cnt").alias("cnt")
    )
    scored = with_median2(dev_hist, "dev", "mad2")
    return (
        scored.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            (F.max("med2").cast("double") / 2000000.0).alias("median_value"),
            (F.max("mad2").cast("double") / 4000000.0).alias("mad_value"),
            F.coalesce(
                F.sum(
                    F.when(
                        2 * F.col("dev") > 3 * F.col("mad2"), F.col("cnt")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


@query(
    "events_tukey_fences",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(round(value*1000000) AS BIGINT) AS mv
      FROM events),
    r AS (
      SELECT event_type, mv,
             row_number() OVER (PARTITION BY event_type ORDER BY mv) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    q AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN rk = (n + 3) // 4 THEN mv END) AS BIGINT)
               AS q1m,
             CAST(SUM(CASE WHEN rk = (3 * n + 3) // 4 THEN mv END)
                  AS BIGINT) AS q3m
      FROM r GROUP BY event_type)
    SELECT q.event_type, q.n,
           CAST(q1m AS DOUBLE) / 1000000.0 AS q1_value,
           CAST(q3m AS DOUBLE) / 1000000.0 AS q3_value,
           COUNT(CASE WHEN 2 * mv < 2 * q1m - 3 * (q3m - q1m) THEN 1 END)
             AS n_low_outliers,
           COUNT(CASE WHEN 2 * mv > 2 * q3m + 3 * (q3m - q1m) THEN 1 END)
             AS n_high_outliers
    FROM v JOIN q USING (event_type)
    GROUP BY q.event_type, q.n, q1m, q3m
    """,
)
def events_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUKEY BOX-PLOT OUTLIER GATE per event_type — the third member of
    the anomaly family next to z-score (moment-based) and MAD (robust
    median): exact nearest-rank quartiles and the classic 1.5×IQR
    fences, all in micro-unit int64.

    EXACT-INTEGER FENCES: with q1/q3 as micro-unit integers, the cut
    v < q1 − 1.5·IQR becomes 2·mv < 2·q1m − 3·(q3m − q1m) — doubling
    clears the half, so no float enters until the two display
    divisions (the anomaly_mad doubling trick applied to fences).

    Scale shape: the same VALUE-HISTOGRAM SELECTION as anomaly_mad —
    one map-combined hash agg to per-(type, mv) counts (a saturating
    domain), quartiles selected by cumulative count over the per-type
    distinct-value list and attached as WINDOW VALUES in place (no
    grouped-agg join-back, so the histogram subtree runs ONCE), then
    one groupBy that reads fence-crossing mass straight off the
    histogram's cnt column.  No per-row sort anywhere."""
    from paraslice_spark.operators.aggregates import hist_selection_frame

    ev = load_tables(spark, sf_dir)["events"]
    hist = (
        ev.select("event_type", micros_units("value").alias("mv"))
        .groupBy("event_type", "mv")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    f = hist_selection_frame(hist, "event_type", "mv")
    wp = Window.partitionBy("event_type")
    lo = F.col("cum") - F.col("cnt")
    rk1 = F.expr("(n + 3) div 4")
    rk3 = F.expr("(3 * n + 3) div 4")
    g = f.select(
        "*",
        F.sum(F.when((lo < rk1) & (rk1 <= F.col("cum")), F.col("mv")))
        .over(wp)
        .alias("q1m"),
        F.sum(F.when((lo < rk3) & (rk3 <= F.col("cum")), F.col("mv")))
        .over(wp)
        .alias("q3m"),
    )
    iqr = F.col("q3m") - F.col("q1m")
    return g.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (F.max("q1m").cast("double") / 1000000.0).alias("q1_value"),
        (F.max("q3m").cast("double") / 1000000.0).alias("q3_value"),
        F.coalesce(
            F.sum(
                F.when(
                    2 * F.col("mv") < 2 * F.col("q1m") - 3 * iqr,
                    F.col("cnt"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_low_outliers"),
        F.coalesce(
            F.sum(
                F.when(
                    2 * F.col("mv") > 2 * F.col("q3m") + 3 * iqr,
                    F.col("cnt"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_high_outliers"),
    )


@query(
    "events_seasonality_profile",
    oracle="""
    WITH base AS (
      SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,  -- Spark 1=Sunday
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod
      FROM events),
    c AS (SELECT dow, hod, COUNT(*) AS n FROM base GROUP BY 1, 2),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT dow, hod, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS share
    FROM c, t ORDER BY dow, hod
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-OF-WEEK × HOUR-OF-DAY activity heatmap — the seasonality
    profile that calibrates anomaly thresholds and capacity planning
    (events_anomaly_zscore's hourly volumes inherit exactly this
    structure).  Calendar functions agree cross-engine here because the
    fixture timestamps are NTZ (no session-timezone dependence — the r3
    lesson); counts exact, one rounded division per cell, ≤ 168 rows."""
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.groupBy(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "dow",
            "hod",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        )
        .repartition(1)
        .sortWithinPartitions("dow", "hod")
    )


@query(
    "text_vocab_growth",
    oracle="""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents),
    first_seen AS (SELECT word, MIN(doc_id) AS fd FROM w GROUP BY 1),
    ids AS (SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS decile
            FROM (SELECT DISTINCT doc_id FROM documents)),
    cuts AS (SELECT decile, MAX(doc_id) AS cut, COUNT(*) AS n_in
             FROM ids GROUP BY 1),
    cum AS (SELECT decile, cut,
                   SUM(n_in) OVER (ORDER BY decile
                                   ROWS UNBOUNDED PRECEDING) AS n_docs
            FROM cuts)
    SELECT decile AS decile, CAST(n_docs AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM first_seen WHERE fd <= cut) AS BIGINT)
             AS vocab_size
    FROM cum ORDER BY decile
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY GROWTH CURVE (Heaps' law V(n) ≈ K·nᵝ) — the corpus-
    health diagnostic that pairs with text_zipf_fit: a healthy crawl
    keeps discovering words; a loop-y or templated one plateaus early.

    Word order is doc_id order (the ingest sequence); each word's FIRST
    document is a min-agg, the ten decile cutpoints come from an ntile
    over the distinct doc ids (custkey-style total order — doc_id is
    unique, so assignment is deterministic), and V(cut) is a count of
    first-seen ≤ cut per cutoff — a 10-row broadcast joined against the
    vocabulary-sized first_seen table, never a running distinct over the
    corpus.  All integers."""
    d = load_tables(spark, sf_dir)["documents"]
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    first_seen = words.groupBy("word").agg(F.min("doc_id").alias("fd"))
    ids = d.select("doc_id").distinct().select(
        "doc_id", F.ntile(10).over(Window.orderBy("doc_id")).alias("decile")
    )
    cuts = ids.groupBy("decile").agg(
        F.max("doc_id").alias("cut"), F.count(F.lit(1)).alias("n_in")
    )
    cum = cuts.select(
        "decile",
        "cut",
        F.sum("n_in")
        .over(
            Window.orderBy("decile").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("n_docs"),
    )
    return (
        # broadcast the 10-row cutpoint table into the vocabulary-sized
        # first_seen side (ADVICE r6: the r6 code had this backwards).
        first_seen.crossJoin(F.broadcast(cum))
        .groupBy("decile", "n_docs")
        .agg(
            F.count(F.when(F.col("fd") <= F.col("cut"), 1)).alias("vocab_size")
        )
        .repartition(1)
        .sortWithinPartitions("decile")
    )


@query(
    "events_interarrival_profile",
    oracle="""
    WITH g AS (
      SELECT (epoch_ns(ts)
              - lag(epoch_ns(ts)) OVER (PARTITION BY user_id
                                        ORDER BY epoch_ns(ts), event_id))
             // 1000 AS gap_us
      FROM events),
    b AS (
      SELECT CASE WHEN gap_us = 0 THEN 0
                  ELSE length(printf('%b', gap_us)) END AS bucket
      FROM g WHERE gap_us IS NOT NULL),
    c AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT CAST(bucket AS BIGINT) AS log2_bucket, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS share
    FROM c, t ORDER BY log2_bucket
    """,
)
def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-ARRIVAL TIME DISTRIBUTION per user, in exact log₂ buckets —
    the burstiness profile that sizes session-gap thresholds (the 30-min
    cut in events_sessionize sits exactly in this histogram's valley)
    and stream watermark windows.

    The bucket is the BINARY DIGIT COUNT of the µs gap (⌊log₂⌋+1) —
    computed by string length of the base-2 rendering on BOTH engines
    (Spark conv(gap,10,2) / DuckDB printf('%b')), so the "log" is pure
    integer/string machinery: no float log anywhere, no quantization
    subtleties.  Gaps in integer µs via the ts_ns div rule; one
    user-keyed lag window, one small histogram agg."""
    ev = load_tables(spark, sf_dir)["events"]
    g = ev.select(
        F.expr(
            "(ts_ns - lag(ts_ns) over (partition by user_id"
            " order by ts_ns, event_id)) div 1000"
        ).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    bucket = F.when(F.col("gap_us") == 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("gap_us"), 10, 2))
    )
    c = g.groupBy(bucket.cast("long").alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "log2_bucket",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        )
        .repartition(1)
        .sortWithinPartitions("log2_bucket")
    )


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH v AS (
      SELECT event_type, epoch_ns(ts) // 60000000000 AS minute,
             CAST(round(value*1000000) AS BIGINT) AS mv
      FROM events),
    b AS (
      SELECT event_type, minute, CAST(SUM(mv) AS BIGINT) AS y
      FROM v GROUP BY 1, 2),
    s AS (
      SELECT event_type, minute,
             CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY minute)
                  AS BIGINT) AS pre,
             row_number() OVER (PARTITION BY event_type ORDER BY minute) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      FROM b),
    c AS (
      SELECT event_type, minute, n, tot, ABS(n*pre - i*tot) AS a FROM s),
    m AS (
      SELECT event_type, MAX(a) AS mx FROM c GROUP BY 1)
    SELECT c.event_type,
           CAST(MAX(c.n) AS BIGINT) AS n_minutes,
           CAST(MIN(CASE WHEN c.a = m.mx THEN c.minute END) AS BIGINT)
             AS cp_minute,
           ROUND(CAST(m.mx AS DOUBLE) / (MAX(c.n) * 1000000.0), 6)
             AS max_cusum,
           ROUND(CAST(MAX(c.tot) AS DOUBLE) / (MAX(c.n) * 1000000.0), 6)
             AS mean_per_minute
    FROM c JOIN m ON c.event_type = m.event_type
    GROUP BY c.event_type, m.mx ORDER BY c.event_type
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGE-POINT DETECTION per event_type (Page 1954) — where did
    the per-minute traffic level shift?  The offline twin of a streaming
    drift monitor, next to events_anomaly_zscore/_mad (outliers) and
    events_forecast_backtest (trend): the minute whose cumulative
    deviation from the series mean is largest is the classic single
    change-point estimate.

    Plan (the anomaly-mad histogram discipline, applied to the TIME
    axis): raw events hash-aggregate to per-(type, minute) micro-unit
    sums — the series length is bounded by the time span, never the row
    count — then ONE partitioned cumulative window over that series
    computes S_i = prefix − i·mean.  All comparisons are EXACT int64 on
    the n-scaled form n·prefix − i·total (|T| ≤ n_minutes·total_micros;
    bound documented — at larger scale widen to per-hour buckets or
    decimal), the argmax tie-breaks to the earliest minute, and the only
    floats are two display divisions → ROUND(,6).  DuckDB's HUGEINT
    window sums make the oracle an overflow canary for the Spark int64
    path."""
    ev = load_tables(spark, sf_dir)["events"]
    b = (
        ev.select(
            "event_type",
            F.expr("ts_ns div 60000000000").alias("minute"),
            micros_units("value").alias("mv"),
        )
        .groupBy("event_type", "minute")
        .agg(F.sum("mv").alias("y"))
    )
    wo = Window.partitionBy("event_type").orderBy("minute")
    wp = Window.partitionBy("event_type")
    s = b.select(
        "event_type",
        "minute",
        F.sum("y").over(wo).alias("pre"),
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("y").over(wp).alias("tot"),
    )
    c = s.select(
        "event_type",
        "minute",
        "n",
        "tot",
        F.abs(F.col("n") * F.col("pre") - F.col("i") * F.col("tot")).alias(
            "a"
        ),
    ).withColumn("mx", F.max("a").over(wp))
    return (
        c.groupBy("event_type", "mx")
        .agg(
            F.max("n").alias("n_minutes"),
            F.min(F.when(F.col("a") == F.col("mx"), F.col("minute"))).alias(
                "cp_minute"
            ),
            F.round(
                F.col("mx").cast("double") / (F.max("n") * 1000000.0), 6
            ).alias("max_cusum"),
            F.round(
                F.max("tot").cast("double") / (F.max("n") * 1000000.0), 6
            ).alias("mean_per_minute"),
        )
        .drop("mx")
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


#: granularities (hours per bucket) of the binseg window-length audit
BINSEG_GRANS = (1, 4, 24)


@query(
    "events_anova_calendar",
    oracle="""
    WITH hc AS MATERIALIZED (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    f AS MATERIALIZED (
      SELECT event_type, y, hr % 24 AS hod, (hr // 24 + 4) % 7 AS dow
      FROM hc),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS sy2
      FROM f GROUP BY 1),
    hg AS (
      SELECT event_type, SUM(CAST(sh * sh AS DOUBLE) / nh) AS bh FROM (
        SELECT event_type, CAST(SUM(y) AS BIGINT) AS sh,
               CAST(COUNT(*) AS BIGINT) AS nh
        FROM f GROUP BY event_type, hod)
      GROUP BY 1),
    dg AS (
      SELECT event_type, SUM(CAST(sd * sd AS DOUBLE) / ndd) AS bd FROM (
        SELECT event_type, CAST(SUM(y) AS BIGINT) AS sd,
               CAST(COUNT(*) AS BIGINT) AS ndd
        FROM f GROUP BY event_type, dow)
      GROUP BY 1),
    cg AS (
      SELECT event_type, SUM(CAST(sc * sc AS DOUBLE) / nc) AS bc,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM (
        SELECT event_type, CAST(SUM(y) AS BIGINT) AS sc,
               CAST(COUNT(*) AS BIGINT) AS nc
        FROM f GROUP BY event_type, hod, dow)
      GROUP BY 1)
    SELECT t.event_type, t.n AS n_hours, t.s AS n_events, cg.n_cells,
           CASE WHEN t.n * t.sy2 = t.s * t.s THEN 0.0
                ELSE ROUND((hg.bh - CAST(t.s * t.s AS DOUBLE) / t.n)
                     / (t.sy2 - CAST(t.s * t.s AS DOUBLE) / t.n), 6) END
             AS eta2_hod,
           CASE WHEN t.n * t.sy2 = t.s * t.s THEN 0.0
                ELSE ROUND((dg.bd - CAST(t.s * t.s AS DOUBLE) / t.n)
                     / (t.sy2 - CAST(t.s * t.s AS DOUBLE) / t.n), 6) END
             AS eta2_dow,
           CASE WHEN t.n * t.sy2 = t.s * t.s THEN 0.0
                ELSE ROUND((cg.bc - CAST(t.s * t.s AS DOUBLE) / t.n)
                     / (t.sy2 - CAST(t.s * t.s AS DOUBLE) / t.n), 6) END
             AS eta2_cell
    FROM tot t
    JOIN hg ON hg.event_type = t.event_type
    JOIN dg ON dg.event_type = t.event_type
    JOIN cg ON cg.event_type = t.event_type
    ORDER BY t.event_type
    """,
)
def events_anova_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR VARIANCE DECOMPOSITION (two-factor ANOVA) of the hourly
    traffic series, per event_type — which calendar factor explains the
    volume variance: η²(hour-of-day), η²(day-of-week), and η²(cell)
    (the full hod×dow model) over the same observed-hour count series
    events_binseg_changepoint splits (level shift) and
    events_seasonality_profile tabulates (means) — this is the MISSING
    third panel: effect SIZE.  A pipeline reads it to decide whether
    hourly seasonality is worth modeling before hunting changepoints.

    Factors are INTEGER-derived from the absolute hour (hod = hr % 24;
    dow = (hr div 24 + 4) % 7 — 1970-01-01 was a Thursday; pure
    non-negative integer arithmetic, no calendar functions, identical
    cross-engine on the NTZ fixture).  η² = SS_between/SS_total with
    every group term CAST(S²  AS DOUBLE)/n an exact-integer-derived
    IEEE division; the SUM over ≤24/7/168 such doubles follows the
    corr/covar house precedent (digit-for-digit at rnd6 — each term
    exact, magnitudes ~1e4, 1-ulp order effects invisible at 1e-6; the
    constant-series case is guarded by the EXACT integer test
    n·Σy² = S²).  By construction 0 ≤ η²(hod), η²(dow) ≤ η²(cell) ≤ 1
    (fuzz-asserted).

    Scale shape: the binseg discipline — raw events hash-aggregate
    ONCE to the per-(type, hour) series (bounded by the time span),
    then three map-combined re-aggs of that tiny series + a 5-row
    join.  The scan is the only data-proportional stage."""
    ev = load_tables(spark, sf_dir)["events"]
    f = (
        ev.select("event_type", F.expr("ts_ns div 3600000000000").alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("y"))
        .select(
            "event_type", "y",
            F.expr("hr % 24").alias("hod"),
            F.expr("(hr div 24 + 4) % 7").alias("dow"),
        )
        .localCheckpoint(eager=False)
    )
    tot = f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )

    def between(*keys):
        g = f.groupBy("event_type", *keys).agg(
            F.sum("y").alias("sg"), F.count(F.lit(1)).alias("ng")
        )
        return g.groupBy("event_type").agg(
            F.sum(
                (F.col("sg") * F.col("sg")).cast("double") / F.col("ng")
            ).alias("b"),
            F.count(F.lit(1)).alias("n_groups"),
        )

    hg = between("hod").select(
        "event_type", F.col("b").alias("bh")
    )
    dg = between("dow").select(
        "event_type", F.col("b").alias("bd")
    )
    cg = between("hod", "dow").select(
        "event_type", F.col("b").alias("bc"), F.col("n_groups").alias("n_cells")
    )
    gm = (F.col("s") * F.col("s")).cast("double") / F.col("n")
    const = F.col("n") * F.col("sy2") == F.col("s") * F.col("s")
    sst = F.col("sy2") - gm

    def eta(b):
        return F.when(const, F.lit(0.0)).otherwise(
            F.round((b - gm) / sst, 6)
        )

    return (
        tot.join(hg, "event_type")
        .join(dg, "event_type")
        .join(cg, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("s").alias("n_events"),
            "n_cells",
            eta(F.col("bh")).alias("eta2_hod"),
            eta(F.col("bd")).alias("eta2_dow"),
            eta(F.col("bc")).alias("eta2_cell"),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


@query(
    "events_binseg_changepoint",
    oracle=f"""
    WITH hc AS MATERIALIZED (
      SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    gb AS MATERIALIZED (
      SELECT event_type, g, hr // g AS bucket, CAST(SUM(c) AS BIGINT) AS y
      FROM hc, (VALUES {", ".join(f"({g})" for g in BINSEG_GRANS)}) AS gr(g)
      GROUP BY 1, 2, 3),
    s AS (
      SELECT event_type, g, bucket, y,
             CAST(SUM(y) OVER w AS BIGINT) AS pre,
             row_number() OVER w AS i,
             COUNT(*) OVER (PARTITION BY event_type, g) AS n,
             CAST(SUM(y) OVER (PARTITION BY event_type, g) AS BIGINT) AS tot,
             CAST(SUM(y * y) OVER (PARTITION BY event_type, g) AS BIGINT)
               AS sy2
      FROM gb
      WINDOW w AS (PARTITION BY event_type, g ORDER BY bucket)),
    sp AS (
      SELECT event_type, g, bucket, i, n, tot, sy2,
             CAST((n * pre - i * tot) AS BIGINT) AS d
      FROM s WHERE i < n),
    bss AS MATERIALIZED (
      SELECT event_type, g, bucket, i, n, tot, sy2,
             CAST(d * d AS DOUBLE) / (n * i * (n - i)) AS b
      FROM sp),
    mx AS (
      SELECT event_type, g, MAX(b) AS mb FROM bss GROUP BY 1, 2)
    SELECT b.event_type, CAST(b.g AS BIGINT) AS gran_hours,
           CAST(MAX(b.n) AS BIGINT) AS n_buckets,
           MAX(b.tot) AS n_events,
           CAST(MIN(CASE WHEN b.b = mx.mb THEN (b.bucket + 1) * b.g END)
                AS BIGINT) AS cp_hour,
           ROUND(CAST(MIN(CASE WHEN b.b = mx.mb THEN b.i END) AS DOUBLE)
                 / MAX(b.n), 6) AS split_frac,
           ROUND(mx.mb / MAX(b.n), 6) AS bss_per_bucket,
           ROUND(CASE WHEN MAX(b.sy2) * MAX(b.n) = MAX(b.tot) * MAX(b.tot)
                      THEN 0.0
                      ELSE mx.mb / (MAX(b.sy2)
                           - CAST(MAX(b.tot) * MAX(b.tot) AS DOUBLE)
                             / MAX(b.n)) END, 6) AS r2
    FROM bss b JOIN mx ON b.event_type = mx.event_type AND b.g = mx.g
    GROUP BY b.event_type, b.g, mx.mb
    ORDER BY b.event_type, b.g
    """,
)
def events_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BINARY-SEGMENTATION CHANGE POINT × WINDOW-LENGTH AUDIT
    (VERDICT r12 #5's suggested family) — the exact-split counterpart of
    events_cusum_changepoint's heuristic, priced at three aggregation
    granularities (1 h / 4 h / 24 h buckets) so the table answers BOTH
    "where does the level shift?" and "does the answer survive the
    window-length knob?" — the audit a monitoring pipeline reads before
    trusting one granularity at the next scale-up.

    For each (event_type, granularity), the per-bucket COUNT series
    y_1..y_n is split at every observed-bucket boundary t and the
    between-segment sum of squares BSS(t) = n_L(μ_L−μ)² + n_R(μ_R−μ)²
    is maximized.  The algebra rides the identity
    BSS(t) = D²/(n·n_L·n_R) with D = n·S_L − n_L·S (the cusum
    n-scaling, squared): D is EXACT int64, and since
    n·S ≤ ~1.5e7 « 2^53 at fixture scale, D² is exactly representable
    in a double, so BSS is ONE exact-integer-derived IEEE division —
    bit-identical in Spark and DuckDB, and the argmax (tie-break:
    earliest bucket) can never diverge (the micro-unit dot-product
    determinism rule, applied to split scoring; bound documented — at
    larger event counts rescale the counts or widen to decimal).
    COUNTS, not value sums, keep the bound: micro-unit sums would
    overflow the 2^53 exactness window.

    Output per (event_type, gran_hours): series length, event total,
    cp_hour (the epoch-hour where the right segment begins, comparable
    ACROSS granularities — the window-length robustness signal),
    split_frac (position of the split in the series), bss_per_bucket,
    and r2 = BSS/TSS (variance explained by the single split; 0 when
    the series is constant).  Splits are over OBSERVED buckets (empty
    buckets absent, like the cusum series).

    Plan: raw events hash-aggregate ONCE to per-(type, hour) counts —
    bounded by the time span, never the row count — and the three
    granularities re-aggregate that tiny series (buckets nest in
    hours), so the sweep costs one scan + windows over ≤ a few
    thousand rows.  At 100 TB the hourly rollup is the only
    data-proportional stage and it is a map-side-combinable count."""
    ev = load_tables(spark, sf_dir)["events"]
    hc = (
        ev.select("event_type", F.expr("ts_ns div 3600000000000").alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gb = (
        hc.select(
            "event_type", "hr", "c",
            F.explode(
                F.array(*[F.lit(g) for g in BINSEG_GRANS])
            ).alias("g"),
        )
        .groupBy("event_type", "g", F.expr("hr div g").alias("bucket"))
        .agg(F.sum("c").alias("y"))
    )
    wo = Window.partitionBy("event_type", "g").orderBy("bucket")
    wp = Window.partitionBy("event_type", "g")
    s = gb.select(
        "event_type", "g", "bucket", "y",
        F.sum("y").over(wo).alias("pre"),
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("y").over(wp).alias("tot"),
        F.sum(F.col("y") * F.col("y")).over(wp).alias("sy2"),
    )
    sp = s.where(F.col("i") < F.col("n")).select(
        "event_type", "g", "bucket", "i", "n", "tot", "sy2",
        (F.col("n") * F.col("pre") - F.col("i") * F.col("tot")).alias("d"),
    )
    # lazy exactness guard (ADVICE r13): BSS is bit-identical cross-engine
    # only while D² is exactly representable in a double, i.e.
    # |D| ≤ isqrt(2^53) = 94906265.  Exceeding the window would diverge
    # SILENTLY (no overflow error — doubles just lose ulps), so the bound
    # rides the plan via the haar span-guard idiom: assert_true is null on
    # success, folds into b as +0.0, and cannot be pruned away.
    d_guard = F.assert_true(
        F.abs(F.col("d")) <= F.lit(94906265),
        F.lit(
            "events_binseg_changepoint: |D| exceeds the 2^53 "
            "double-exactness window; rescale the bucket counts"
        ),
    )
    bss = sp.select(
        "event_type", "g", "bucket", "i", "n", "tot", "sy2",
        (
            (
                (F.col("d") * F.col("d")).cast("double")
                + F.coalesce(d_guard.cast("double"), F.lit(0.0))
            )
            / (F.col("n") * F.col("i") * (F.col("n") - F.col("i")))
        ).alias("b"),
    ).withColumn("mb", F.max("b").over(wp))
    return (
        bss.groupBy("event_type", "g", "mb")
        .agg(
            F.max("n").alias("n_buckets"),
            F.max("tot").alias("n_events"),
            F.min(
                F.when(F.col("b") == F.col("mb"), (F.col("bucket") + 1) * F.col("g"))
            ).alias("cp_hour"),
            F.round(
                F.min(F.when(F.col("b") == F.col("mb"), F.col("i"))).cast(
                    "double"
                )
                / F.max("n"),
                6,
            ).alias("split_frac"),
            F.round(F.col("mb") / F.max("n"), 6).alias("bss_per_bucket"),
            F.round(
                F.when(
                    F.max("sy2") * F.max("n") == F.max("tot") * F.max("tot"),
                    F.lit(0.0),
                ).otherwise(
                    F.col("mb")
                    / (
                        F.max("sy2")
                        - (F.max("tot") * F.max("tot")).cast("double")
                        / F.max("n")
                    )
                ),
                6,
            ).alias("r2"),
        )
        .select(
            "event_type",
            F.col("g").cast("long").alias("gran_hours"),
            "n_buckets", "n_events", "cp_hour", "split_frac",
            "bss_per_bucket", "r2",
        )
        .repartition(1)
        .sortWithinPartitions("event_type", "gran_hours")
    )


@query(
    "sample_bottom_k",
    oracle="""
    SELECT lang, rk, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= 10
    """,
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTTOM-K SAMPLING — the deterministic distributed reservoir: per
    stratum (lang), keep the k=10 docs with the SMALLEST md5(doc_id)
    (ties broken by doc_id; md5 is the rank, so the sample is a pure
    function of content keys).  Bottom-k is MERGEABLE — bottom-k of a
    union is the bottom-k of the concatenated bottom-k's — which is what
    makes it the scale-out replacement for sequential reservoir
    sampling: every partition keeps its own k, one tiny merge wins
    (exactly how Spark executes this plan: WindowGroupLimit prunes to k
    per partition BEFORE the per-stratum shuffle).  Unlike
    sample_stratified_hash (md5-THRESHOLD, rate-controlled, count
    varies) this fixes the exact sample SIZE per stratum; both are
    growth-stable in the sense that the rank of an existing doc never
    changes when new docs arrive — membership changes only by
    displacement from the boundary."""
    d = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select("lang", "rk", "doc_id", "n_chars")
    )


@query(
    "events_session_concurrency",
    oracle=f"""
    WITH {SESSIONIZE_SQL},
    b AS (
        SELECT user_id, session_idx,
               MIN(ts_ns) // 3600000000000 AS sh,
               MAX(ts_ns) // 3600000000000 AS eh
        FROM s GROUP BY 1, 2),
    e AS (SELECT user_id, unnest(range(sh, eh + 1)) AS hr FROM b)
    SELECT hr, COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users
    FROM e GROUP BY hr
    """,
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCURRENT-SESSION LOAD PROFILE — for each clock hour, how many
    gap-based sessions (events_sessionize's exact 30-min rule) were IN
    PROGRESS during that hour, and by how many distinct users: the
    capacity-planning view (peak concurrency) that DAU
    (events_active_users) deliberately blurs.  Interval-overlap
    semantics: a session [start, end] counts toward every hour bucket
    its span touches.

    Scale shape: sessionization is the one user-keyed shuffle (two
    stacked windows sharing a single partition/order — same plan as
    events_sessionize); session bounds collapse events to one row per
    session BEFORE the interval explode, whose fanout is
    session-duration hours (gap-bounded sessions are short; a
    pathological year-long session costs 8 760 rows, not a join).  The
    hour rollup is a map-combined agg on integer epoch-hours — emitted
    AS integers (tz-independent, the r3 NTZ lesson; a consumer formats
    them).  No calendar spine needed: hours with no sessions simply
    don't appear (the gap-fill twin is events_hourly_gapfill)."""
    ev = load_tables(spark, sf_dir)["events"]
    sess = (
        with_session_idx(ev)
        .groupBy("user_id", "session_idx")
        .agg(
            F.expr("min(ts_ns) div 3600000000000").alias("sh"),
            F.expr("max(ts_ns) div 3600000000000").alias("eh"),
        )
    )
    hours = sess.select(
        "user_id",
        F.explode(F.sequence(F.col("sh"), F.col("eh"))).alias("hr"),
    )
    return hours.groupBy("hr").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "customer_gini_by_nation",
    oracle="""
    WITH s AS (SELECT o_custkey,
                      SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS spend_c
               FROM orders GROUP BY 1),
    r AS (SELECT n.n_name, s.spend_c,
                 row_number() OVER (PARTITION BY n.n_name
                                    ORDER BY s.spend_c, s.o_custkey) AS i
          FROM s
          JOIN customer c ON c.c_custkey = s.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey),
    g AS (SELECT n_name,
                 CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(SUM(spend_c) AS BIGINT) AS s1,
                 CAST(SUM(i * spend_c) AS BIGINT) AS s2
          FROM r GROUP BY 1)
    SELECT n_name, n_customers,
           CAST(s1 AS DOUBLE) / 100.0 AS revenue,
           ROUND(CAST(2 * s2 - (n_customers + 1) * s1 AS DOUBLE)
                 / (n_customers * s1), 6) AS gini
    FROM g
    """,
)
def customer_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE INEQUALITY per nation — the Gini coefficient of customer
    spend, the one-number concentration summary next to the Lorenz
    deciles (customer_revenue_deciles) and ABC classes
    (part_abc_analysis).  Population = customers WITH orders (an inner
    join on the order rollup; zero-spend customers would need a left
    join and shift every Gini toward 1 — documented choice).

    EXACT-INTEGER FORMULA: with per-nation ranks i (ascending spend,
    custkey tie-break), G = (2*sum(i*x_i) - (n+1)*sum(x_i)) /
    (n*sum(x_i)) — the numerator is an exact int64 cents expression,
    ONE IEEE division at the end, ROUND(,6) engine-stable; the
    denominator n*s1 is formed as double*int64 (one factor pre-cast —
    the supplier_hhi_by_type dodge): exact under 2^53 at the
    documented scales, and it cannot silently wrap in non-ANSI Spark
    where a raw int64 product could.
    i*x_i stays < 2^63 to ~4e8 customers per nation at 1e7-cent spends
    (DuckDB HUGEINT is the overflow canary; beyond that, rescale cents
    to dollars first).

    Scale shape: the fact table collapses to |customers| rows FIRST
    (one map-combined shuffle), then one shuffle join to customer for
    the nation key (at 100 TB both sides are custkey-hashed — AQE picks
    SMJ), a broadcast of the 25-row nation dim, and the rank window is
    PARTITIONED BY nation — ~n/25 rows per task, never a global sort
    (the deciles lesson).  25 output rows."""
    t = load_tables(spark, sf_dir)
    s = t["orders"].groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_c")
    )
    r = (
        s.join(
            t["customer"].select("c_custkey", "c_nationkey"),
            s["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "spend_c", "o_custkey")
    )
    w = Window.partitionBy("n_name").orderBy("spend_c", "o_custkey")
    g = (
        r.withColumn("i", F.row_number().over(w))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_c").alias("s1"),
            F.sum(F.col("i") * F.col("spend_c")).alias("s2"),
        )
    )
    return g.select(
        "n_name",
        "n_customers",
        (F.col("s1").cast("double") / 100.0).alias("revenue"),
        F.round(
            (2 * F.col("s2") - (F.col("n_customers") + 1) * F.col("s1"))
            .cast("double")
            / (F.col("n_customers").cast("double") * F.col("s1")),
            6,
        ).alias("gini"),
    )


#: Fixed half-year boundary + absolute half-spend band cuts (cents) for
#: customer_band_migration — thresholds sit at the measured per-half spend
#: tertiles (~$212k / ~$410k at every SF; the pipeline_quality_filter
#: measured-constant discipline), so all four bands are populated and the
#: rule needs no rank/quantile pass at any scale.
_MIG_SPLIT_DATE = "1995-07-01"
_MIG_LOW_C = 20_000_000
_MIG_HIGH_C = 40_000_000


def _mig_band_sql(col: str) -> str:
    """DuckDB band rule twin of :func:`_mig_band`."""
    return (
        f"CASE WHEN {col} = 0 THEN 'none' "
        f"WHEN {col} < {_MIG_LOW_C} THEN 'low' "
        f"WHEN {col} < {_MIG_HIGH_C} THEN 'mid' ELSE 'high' END"
    )


def _mig_band(col: str):
    """Absolute-threshold spend band: none/low/mid/high on exact cents."""
    c = F.col(col)
    return (
        F.when(c == 0, "none")
        .when(c < _MIG_LOW_C, "low")
        .when(c < _MIG_HIGH_C, "mid")
        .otherwise("high")
    )


@query(
    "customer_band_migration",
    oracle=f"""
    WITH s AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderdate < DATE '{_MIG_SPLIT_DATE}'
                      THEN CAST(round(o_totalprice*100) AS BIGINT)
                      ELSE 0 END) AS h1_c,
             SUM(CASE WHEN o_orderdate >= DATE '{_MIG_SPLIT_DATE}'
                      THEN CAST(round(o_totalprice*100) AS BIGINT)
                      ELSE 0 END) AS h2_c
      FROM orders GROUP BY 1),
    b AS (
      SELECT {_mig_band_sql('COALESCE(h1_c, 0)')} AS band_h1,
             {_mig_band_sql('COALESCE(h2_c, 0)')} AS band_h2,
             COALESCE(h1_c, 0) + COALESCE(h2_c, 0) AS tot_c
      FROM customer LEFT JOIN s ON c_custkey = o_custkey)
    SELECT band_h1, band_h2, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(tot_c) AS BIGINT) AS DOUBLE) / 100.0 AS revenue
    FROM b GROUP BY band_h1, band_h2
    """,
)
def customer_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENT MIGRATION MATRIX — where customers move between spend
    bands from the first half of the TPC-H date range to the second:
    the churn/upgrade/downgrade rollup a retention team reads weekly
    (band_h1='high' & band_h2='none' is churned whales; 'none'→any is
    acquisition).  Bands are ABSOLUTE cents thresholds at the measured
    per-half tertiles, so no per-half ranking pass exists anywhere —
    the deciles lesson solved by rule rather than re-plan.

    Scale shape: ONE conditional-sum pass collapses orders to
    |customers| rows (both halves in the same map-combined agg — no
    half×half self-join), one custkey-hashed LEFT join from the
    customer spine (keeps never-ordered customers as the 'none'/'none'
    cell), then a ≤16-row matrix agg.  All cents exact int64; the one
    revenue display division happens after the final SUM (DuckDB's
    HUGEINT re-sum is the overflow canary)."""
    t = load_tables(spark, sf_dir)
    split = F.lit(_MIG_SPLIT_DATE).cast("date")
    s = t["orders"].groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < split, cents("o_totalprice"))
            .otherwise(F.lit(0))
        ).alias("h1_c"),
        F.sum(
            F.when(F.col("o_orderdate") >= split, cents("o_totalprice"))
            .otherwise(F.lit(0))
        ).alias("h2_c"),
    )
    b = (
        t["customer"]
        .select("c_custkey")
        .join(s, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            F.coalesce("h1_c", F.lit(0)).alias("h1_c"),
            F.coalesce("h2_c", F.lit(0)).alias("h2_c"),
        )
    )
    return (
        b.select(
            _mig_band("h1_c").alias("band_h1"),
            _mig_band("h2_c").alias("band_h2"),
            (F.col("h1_c") + F.col("h2_c")).alias("tot_c"),
        )
        .groupBy("band_h1", "band_h2")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("tot_c").cast("double") / 100.0).alias("revenue"),
        )
    )


def _funnel_latency_oracle() -> str:
    """Composed from the REGISTERED events_funnel_users oracle (the
    dedup_method_agreement precedent: the stage rule cannot
    desynchronize because it is not restated).  Single reference, so no
    MATERIALIZED needed."""
    from paraslice_spark.registry import ORACLES

    return f"""
    WITH fu AS ({ORACLES["events_funnel_users"]}),
    lat AS (
      SELECT 'view_to_click' AS step,
             (t_click - t_view) // 1000000000 AS lat_s
      FROM fu WHERE t_click IS NOT NULL
      UNION ALL
      SELECT 'click_to_purchase',
             (t_purchase - t_click) // 1000000000
      FROM fu WHERE t_purchase IS NOT NULL),
    r AS (
      SELECT step, lat_s,
             row_number() OVER (PARTITION BY step ORDER BY lat_s) AS rk,
             COUNT(*) OVER (PARTITION BY step) AS n
      FROM lat)
    SELECT step, CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rk = (n + 1) // 2 THEN lat_s END) AS BIGINT)
             AS p50_s,
           CAST(SUM(CASE WHEN rk = (9 * n + 9) // 10 THEN lat_s END)
                AS BIGINT) AS p90_s,
           ROUND(CAST(CAST(SUM(lat_s) AS BIGINT) AS DOUBLE) / MAX(n), 6)
             AS mean_s
    FROM r GROUP BY step ORDER BY step
    """


@query("events_funnel_latency", oracle=_funnel_latency_oracle())
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT per funnel transition — exact nearest-rank p50/p90
    and mean of the latency between a user's qualifying stage times
    (strictly-ordered first view → first click → first purchase), the
    "how long does the funnel take" companion to events_funnel's "how
    many make it".

    Builds DIRECTLY on the funnel_user_times core (the declared
    events_funnel_users minus its presentation tail; the oracle wraps
    the REGISTERED oracle — neither restates the stage rule).  Latencies quantize to
    whole SECONDS (integer ns div 1e9 — the declared granularity), and
    the order statistics are selected by CUMULATIVE COUNT over the
    per-(step, second) histogram — the anomaly-MAD/percentile-histogram
    discipline: no per-row sort; the selection windows run over the
    time-span-bounded distinct-seconds table.  Mean is one exact int64
    sum and one IEEE division, ROUND(,6).

    Scale shape: the funnel table is user-keyed aggs + joins (its own
    docstring), the latency stack is a map, the histogram is one
    map-combined shuffle on (step, second); the two selection windows
    partition by step over distinct seconds only.  2 output rows."""
    fu = funnel_user_times(load_tables(spark, sf_dir)["events"])
    lat = fu.selectExpr(
        """stack(2,
                 'view_to_click',
                 CASE WHEN t_click IS NOT NULL
                      THEN (t_click - t_view) div 1000000000 END,
                 'click_to_purchase',
                 CASE WHEN t_purchase IS NOT NULL
                      THEN (t_purchase - t_click) div 1000000000 END)
           AS (step, lat_s)"""
    ).where(F.col("lat_s").isNotNull())
    from paraslice_spark.operators.aggregates import (
        hist_at_rank,
        hist_selection_frame,
    )

    hist = lat.groupBy("step", "lat_s").agg(F.count(F.lit(1)).alias("cnt"))
    r = hist_selection_frame(hist, "step", "lat_s").withColumn(
        "wsum", F.col("lat_s") * F.col("cnt")
    )
    return (
        r.groupBy("step")
        .agg(
            F.max("n").alias("n"),
            hist_at_rank("lat_s", "(n + 1) div 2").alias("p50_s"),
            hist_at_rank("lat_s", "(9 * n + 9) div 10").alias("p90_s"),
            F.round(
                F.sum("wsum").cast("double") / F.max("n"), 6
            ).alias("mean_s"),
        )
        .repartition(1)
        .sortWithinPartitions("step")
    )


@query(
    "supplier_hhi_by_type",
    oracle="""
    WITH q AS (
      SELECT p.p_type, l.l_suppkey,
             SUM(CAST(round(l.l_quantity*100) AS BIGINT)) AS q_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    t AS (
      SELECT p_type,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(q_c) AS BIGINT) AS tot_c,
             CAST(SUM(q_c * q_c) AS BIGINT) AS sq_c,
             CAST(MAX(q_c) AS BIGINT) AS max_c
      FROM q GROUP BY 1)
    SELECT p_type, n_suppliers,
           CAST(tot_c AS DOUBLE) / 100.0 AS total_qty,
           ROUND(CAST(sq_c AS DOUBLE) / (CAST(tot_c AS DOUBLE) * tot_c), 6)
             AS hhi,
           ROUND(CAST(max_c AS DOUBLE) / tot_c, 6) AS top_share
    FROM t
    """,
)
def supplier_hhi_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUPPLY-CONCENTRATION audit — the Herfindahl-Hirschman index of
    supplier quantity shares per part type, plus the top supplier's
    share: the sourcing-risk table (HHI > 0.25 = concentrated market)
    next to part_abc_analysis (value concentration) and
    customer_gini_by_nation (demand inequality).

    EXACT-INTEGER HHI: with per-(type, supplier) quantity cents q_i,
    HHI = sum(q_i^2) / (sum q_i)^2 — numerator and denominator exact
    int64 (denominator formed as double*double of ONE exact int to dodge
    the int64 square overflow earlier: tot^2 up to 1e14 is
    double-exact under 2^53 at these SFs; DuckDB mirrors the same
    double product, and its HUGEINT sq_c sum is the overflow canary for
    the numerator).  Two IEEE divisions total, ROUND(,6).

    Scale shape: ONE fact pass — lineitem joins only the broadcast part
    dim for p_type, hash-aggregates (type, supplier) with map-side
    combine, then collapses to |types| rows; the squaring runs on the
    aggregated table (the cms_selfjoin rule: never square fact rows).
    150 output rows."""
    t = load_tables(spark, sf_dir)
    q = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("q_c"))
    )
    agg = q.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("q_c").alias("tot_c"),
        F.sum(F.col("q_c") * F.col("q_c")).alias("sq_c"),
        F.max("q_c").alias("max_c"),
    )
    tot_d = F.col("tot_c").cast("double")
    return agg.select(
        "p_type",
        "n_suppliers",
        (tot_d / 100.0).alias("total_qty"),
        F.round(F.col("sq_c").cast("double") / (tot_d * F.col("tot_c")), 6).alias(
            "hhi"
        ),
        F.round(F.col("max_c").cast("double") / F.col("tot_c"), 6).alias(
            "top_share"
        ),
    )


@query(
    "orders_ship_latency",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority,
             CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
               AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    r AS (
      SELECT o_orderpriority, delay_days,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY delay_days) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM d)
    SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN rk = (n + 1) // 2 THEN delay_days END)
                AS BIGINT) AS p50_days,
           CAST(SUM(CASE WHEN rk = (9 * n + 9) // 10 THEN delay_days END)
                AS BIGINT) AS p90_days,
           ROUND(CAST(CAST(SUM(delay_days) AS BIGINT) AS DOUBLE) / MAX(n), 6)
             AS mean_days
    FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def orders_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULFILLMENT LATENCY distribution — exact nearest-rank p50/p90 and
    mean of order-to-ship days per order priority: the operational-SLA
    view behind TPC-H q4's binary "late" flag.

    Day deltas are exact integers on both engines (NTZ timestamp → DATE
    cast is tz-independent — the r3 lesson — and DATE subtraction /
    datediff both count whole days).  Selection runs on the per-
    (priority, delay) COUNT HISTOGRAM via the shared
    hist_selection_frame/hist_at_rank machinery (5-value partition key
    ⇒ never sort raw lines — the anomaly-MAD discipline); the delay
    domain is contract-bounded (~0-122 days), so the selection windows
    see ≤ |priorities|×|domain| rows.  Mean is one exact int64 sum and
    one IEEE division, ROUND(,6).

    Scale shape: one lineitem-orders equi-join on the natural key (at
    100 TB both sides are orderkey-partitioned — co-located SMJ), then
    a map-combined histogram agg; 5 output rows."""
    from paraslice_spark.operators.aggregates import (
        hist_at_rank,
        hist_selection_frame,
    )

    t = load_tables(spark, sf_dir)
    d = t["lineitem"].select("l_orderkey", "l_shipdate").join(
        t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("delay_days"),
    )
    hist = d.groupBy("o_orderpriority", "delay_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    r = hist_selection_frame(hist, "o_orderpriority", "delay_days").withColumn(
        "wsum", F.col("delay_days") * F.col("cnt")
    )
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_lines"),
            hist_at_rank("delay_days", "(n + 1) div 2").alias("p50_days"),
            hist_at_rank("delay_days", "(9 * n + 9) div 10").alias("p90_days"),
            F.round(F.sum("wsum").cast("double") / F.max("n"), 6).alias(
                "mean_days"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )


#: events_watermark_late_audit contract constants
WM_DELAY_NS = 600_000_000_000  # 10-min watermark delay
_WM_C = 65536  # fixed prefix-scan fanout (id-bucket width per level)


@query(
    "events_watermark_late_audit",
    oracle=f"""
    WITH e AS (
      SELECT event_id, epoch_ns(ts) AS ts_ns,
             (epoch_ns(ts) // 3600000000000) AS hr,
             (epoch_ns(ts) // 3600000000000 + 1) * 3600000000000 AS hr_end
      FROM events),
    wm AS (
      SELECT hr, hr_end,
             MAX(ts_ns) OVER (ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prefix_max
      FROM e)
    SELECT hr, CAST(COUNT(*) AS BIGINT) AS n_events,
           COUNT(CASE WHEN prefix_max - {WM_DELAY_NS} >= hr_end
                      THEN 1 END) AS n_late
    FROM wm GROUP BY hr
    """,
)
def events_watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA AUDIT — the declared surface for ST4: replay
    the fixture in ARRIVAL ORDER (event_id — the deterministic arrival
    proxy the streaming replay tests use) and count, per hour window,
    the events a Structured Streaming job with a 10-min watermark would
    DROP: an event is late iff the watermark at its arrival
    (max event-time seen strictly before it, minus the delay) has
    already passed its window's end — exactly Spark's eviction rule.
    Run this batch audit before picking a production
    ``withWatermark`` delay: n_late is the data loss that delay buys.

    The interesting scale problem is the STRICT PREFIX MAX over arrival
    order — a global running max is a SinglePartition window (the
    deciles trap, on a scan instead of a sort).  Here it's the textbook
    DISTRIBUTED PREFIX SCAN, three fixed levels of id-buckets (C=65536):

    1. in-bucket strict prefix — window PARTITIONED BY b1 (≤C rows/task);
    2. per-bucket maxes roll up to L1; their in-group strict prefix is a
       window PARTITIONED BY b2 (≤C buckets/task);
    3. the L2 summary (n/C² rows — 233 rows at a TRILLION events) takes
       the only unpartitioned window, then offsets broadcast back down.

    prefix(e) = greatest(in-bucket, L1-offset, L2-offset) — max is
    associative, so the decomposition is exact; every quantity is an
    int64 ns epoch, so the oracle's one-window form matches
    bit-for-bit.  The final rollup is a map-combined agg on ~253 hour
    keys.  First arrival has NULL prefix → never late (both engines).

    VACUITY NOTE (measured, the dedup_embedding_cosine discipline): the
    fixture stream arrives EXACTLY in event-time order at every sf (max
    prefix_max − ts is negative), so n_late is structurally 0 here at
    ANY delay — the declared contract's signal is the per-hour arrival
    histogram plus the measured "ordered corpus loses nothing" fact.
    The NON-vacuous declared twin is events_watermark_late_replay
    (deterministic md5-permuted arrival, n_late > 0 at every SF), which
    hash-oracles the eviction rule itself; the planted-disorder test
    (tests/test_pipeline_features.py) additionally pins both arrival
    orders to a pure-Python streaming replay."""
    return watermark_late_counts(load_tables(spark, sf_dir)["events"])


def watermark_late_counts(ev: DataFrame) -> DataFrame:
    """Core three-level prefix-scan + eviction-rule audit over any
    (event_id, ts_ns) frame, arrival order = event_id — split out so
    tests can feed PLANTED disordered arrivals (the corpus itself
    arrives in order; events_watermark_late_replay is the declared
    disordered-arrival surface)."""
    hr = F.expr("ts_ns div 3600000000000")
    e = ev.select(
        "event_id",
        "ts_ns",
        hr.alias("hr"),
        ((hr + 1) * 3_600_000_000_000).alias("hr_end"),
        F.expr(f"event_id div {_WM_C}").alias("b1"),
        F.expr(f"event_id div {_WM_C} div {_WM_C}").alias("b2"),
    )
    return _wm_late_core(e, ["event_id"])


def _wm_late_core(e: DataFrame, order_cols: list) -> DataFrame:
    """Three-level strict-prefix-max + the 10-min eviction rule, grouped
    per hour window — the shared engine of both declared ST4 audits."""
    wm = _wm_prefix_frame(e, order_cols)
    late = (F.col("prefix_max") - WM_DELAY_NS) >= F.col("hr_end")
    return wm.groupBy("hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(late, F.lit(1))).alias("n_late"),
    )


def _wm_prefix_frame(e: DataFrame, order_cols: list) -> DataFrame:
    """Shared three-level distributed strict-prefix-max: appends
    ``prefix_max`` (max ts_ns strictly before each row in arrival order)
    to ``e``.

    ``e`` must carry (ts_ns, hr, hr_end, b1, b2) plus the arrival-order
    columns.  CONTRACT: (b1, b2) are pure functions of the order key,
    monotone non-decreasing in it (so order-key ties never straddle a
    bucket and per-bucket maxima compose into the global strict prefix
    by max-associativity), and b2 groups b1.  Level sizes: the in-bucket
    window is PARTITIONED BY b1, L1 by b2, and only the L2 summary
    (one row per b2) takes an unpartitioned window."""
    # r15 (guide §2.4, the r11 scan-once precedent): the DAG fans ``e``
    # out to three consumers (the L1 rollup, reached via both the l2_off
    # and l1_off branches, plus the final join) — without a checkpoint
    # each consumer re-scans the source and recomputes the arrival
    # projection (the session audit's per-row md5 lag).  One non-eager
    # localCheckpoint of the narrow bucketed frame + one of the tiny L1
    # rollup leave exactly ONE data-proportional pass over ``e`` per
    # level; both are per-call, cache-manager-free (house hygiene).
    e = e.localCheckpoint(eager=False)
    w_in = (
        Window.partitionBy("b1")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # L1: one row per id-bucket (max ts + its L2 group)
    l1 = (
        e.groupBy("b1", "b2")
        .agg(F.max("ts_ns").alias("m1"))
        .localCheckpoint(eager=False)
    )
    w_l1 = (
        Window.partitionBy("b2")
        .orderBy("b1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # L2: one row per C² ids — tiny at any corpus size; the only
    # unpartitioned window runs here
    l2 = l1.groupBy("b2").agg(F.max("m1").alias("m2"))
    w_l2 = (
        Window.orderBy("b2").rowsBetween(Window.unboundedPreceding, -1)
    )
    l2_off = l2.select("b2", F.max("m2").over(w_l2).alias("off2"))
    l1_off = (
        l1.withColumn("off1", F.max("m1").over(w_l1))
        .join(F.broadcast(l2_off), "b2")
        .select(
            "b1",
            F.greatest(F.col("off1"), F.col("off2")).alias("off"),
        )
    )
    return (
        e.join(l1_off, "b1")
        .withColumn("inb", F.max("ts_ns").over(w_in))
        .withColumn("prefix_max", F.greatest("inb", "off"))
    )


@query(
    "events_watermark_late_replay",
    oracle=f"""
    WITH e AS (
      SELECT {md5_u32_sql('event_id')} AS h, event_id,
             epoch_ns(ts) AS ts_ns,
             (epoch_ns(ts) // 3600000000000) AS hr,
             (epoch_ns(ts) // 3600000000000 + 1) * 3600000000000 AS hr_end
      FROM events),
    wm AS (
      SELECT hr, hr_end,
             MAX(ts_ns) OVER (ORDER BY h, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prefix_max
      FROM e)
    SELECT hr, CAST(COUNT(*) AS BIGINT) AS n_events,
           COUNT(CASE WHEN prefix_max - {WM_DELAY_NS} >= hr_end
                      THEN 1 END) AS n_late
    FROM wm GROUP BY hr
    """,
)
def events_watermark_late_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA REPLAY (the NON-vacuous ST4 twin) — the same
    eviction-rule audit as events_watermark_late_audit, but arrival
    order is a DETERMINISTIC PLANTED-DISORDER permutation of the
    stream: events arrive in (md5_u32(event_id), event_id) order — the
    sample_temperature hash idiom applied to arrival.  The fixture's
    natural arrival is exactly event-time-ordered, so the audit's
    n_late is structurally 0 at every delay (the documented vacuity);
    under the md5 permutation the watermark races to near-max event
    time within the first few arrivals, so every hour window except
    the stream's tail loses real events — n_late > 0 at every SF, and
    the per-hour keep/drop split depends on the permutation's fine
    structure.  This makes Spark's eviction rule ITSELF hash-oracled:
    a broken strict-prefix scan, a >= vs > slip, or an off-by-one in
    the delay all flip concrete cells.

    Since the delay sweep landed, both planted-disorder surfaces read
    the prefix frame through the per-(session, sf)
    :func:`_replay_wm_cached` memo — the scan below runs once.

    Scale shape IMPROVES on the dense-id audit: buckets come from the
    hash's own uniform high bits (b1 = h div 2^16 → ≤65536 balanced
    buckets regardless of n; b2 = b1 div 2^8 → ≤256 groups), so every
    window but the ≤256-row L2 summary is partitioned, and in-bucket
    tasks hold ~n/65536 rows at any corpus size.  b1 is monotone in h
    and a pure function of it, so h-ties never straddle buckets and
    the three-level decomposition stays exact (the _wm_late_core
    contract).  DuckDB twin: one window over the same permutation."""
    wm = _replay_wm_cached(spark, sf_dir)
    late = (F.col("prefix_max") - WM_DELAY_NS) >= F.col("hr_end")
    return wm.groupBy("hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(late, F.lit(1))).alias("n_late"),
    )


#: per-(session, sf) memo of the md5-permuted prefix frame — the shared
#: base of the late replay and the delay sweep (the _knn_cache contract)
_replay_wm_cache: dict = {}


def _replay_wm_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (arrival frame + prefix_max) for the planted-disorder
    surfaces: the three-level prefix scan runs ONCE per (session, sf)
    and both declared consumers (per-hour replay, delay sweep) are
    cheap rollups of it."""
    from paraslice_spark.sources.io import _session_key

    key = (_session_key(spark), sf_dir.rstrip("/"))
    if key not in _replay_wm_cache:
        ev = load_tables(spark, sf_dir)["events"]
        _replay_wm_cache[key] = _wm_prefix_frame(
            _replay_arrival_frame(ev), ["h", "event_id"]
        ).localCheckpoint(eager=True)
    return _replay_wm_cache[key]


def _replay_arrival_frame(ev: DataFrame) -> DataFrame:
    """The md5-permuted arrival frame shared by the late replay and the
    delay sweep (single-source permutation + bucket rule — the two
    declared surfaces cannot disagree on what "arrival order" means)."""
    hr = F.expr("ts_ns div 3600000000000")
    h = md5_u32("event_id")
    return ev.select(
        h.alias("h"),
        "event_id",
        "ts_ns",
        hr.alias("hr"),
        ((hr + 1) * 3_600_000_000_000).alias("hr_end"),
    ).select(
        "*",
        F.expr(f"h div {_WM_C}").alias("b1"),
        F.expr(f"h div {_WM_C} div 256").alias("b2"),
    )


#: the candidate withWatermark delays the sweep prices (seconds)
_WM_SWEEP_S = (60, 600, 3600, 21600, 86400)


@query(
    "events_watermark_delay_sweep",
    oracle=f"""
    WITH e AS (
      SELECT {md5_u32_sql('event_id')} AS h, event_id,
             epoch_ns(ts) AS ts_ns,
             (epoch_ns(ts) // 3600000000000 + 1) * 3600000000000 AS hr_end
      FROM events),
    wm AS (
      SELECT hr_end,
             MAX(ts_ns) OVER (ORDER BY h, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prefix_max
      FROM e),
    d AS (SELECT CAST(unnest([{', '.join(str(d) for d in _WM_SWEEP_S)}])
                      AS BIGINT) AS delay_s)
    SELECT delay_s, CAST(COUNT(*) AS BIGINT) AS n_events,
           COUNT(CASE WHEN prefix_max - delay_s * 1000000000 >= hr_end
                      THEN 1 END) AS n_late,
           CAST(COUNT(CASE WHEN prefix_max - delay_s * 1000000000 >= hr_end
                           THEN 1 END) * 1000000 // COUNT(*) AS BIGINT)
             AS loss_ppm
    FROM wm, d GROUP BY delay_s
    """,
)
def events_watermark_delay_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK DELAY SWEEP — the calibration table the two audits
    point at: under the SAME md5-permuted planted-disorder arrival as
    events_watermark_late_replay (shared :func:`_replay_arrival_frame`
    — one permutation definition), price the candidate ``withWatermark``
    delays from 1 minute to 1 day: total events dropped and the loss
    rate in ppm per delay.  This is the loss curve an operator reads
    before committing state-store memory to a longer delay — the
    MinHash/CMS/ANN-recall calibration discipline applied to streaming
    eviction.

    Scale shape: the three-level prefix scan runs ONCE per (session,
    sf) (the :func:`_replay_wm_cached` memo shared with the replay);
    all five delays are CONDITIONAL COUNTS
    inside one map-combined global agg over the same frame (no
    per-delay re-scan, no fanout join), then a 5-row stack computes
    loss_ppm by integer division (operands non-negative; n_late·10⁶
    stays int64-exact to ~9·10¹² late events).  The oracle prices the
    delays off one window + a 5-row cross join."""
    wm = _replay_wm_cached(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    for d in _WM_SWEEP_S:
        late = (F.col("prefix_max") - d * 1_000_000_000) >= F.col("hr_end")
        aggs.append(F.count(F.when(late, F.lit(1))).alias(f"l{d}"))
    t = wm.agg(*aggs)
    pairs = ", ".join(f"CAST({d} AS BIGINT), l{d}" for d in _WM_SWEEP_S)
    return t.selectExpr(
        "n", f"stack({len(_WM_SWEEP_S)}, {pairs}) AS (delay_s, n_late)"
    ).select(
        "delay_s",
        F.col("n").alias("n_events"),
        "n_late",
        F.expr("n_late * 1000000 div n").alias("loss_ppm"),
    )


#: SESSION-WINDOW × WATERMARK audit parameters.  A DISTINCT lens from the
#: 30-min SESSION_GAP_NS sessionize rule: at the fixture's per-user cadence
#: (median inter-event gap ≈ 7.4 h at every SF — users scale with SF, so
#: the per-user gap distribution is SF-invariant) a 30-min gap yields ~95%
#: singleton sessions and the split/merge signal is structurally vacuous
#: (measured; the dedup_embedding_cosine discipline).  12-hour episodes
#: chain 3 events on average, so dropped late rows really do split them.
EPISODE_GAP_NS = 43_200_000_000_000  # 12 h inactivity closes an episode
EP_WM_DELAY_NS = 7_200_000_000_000  # 2 h withWatermark delay under audit
EP_MAX_DELAY_S = 86_400  # bounded ingestion delay: md5 % 86400 s (0..24 h)


@query(
    "events_session_watermark_audit",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
             epoch_ns(ts)
               + ({md5_u32_sql('event_id')} % {EP_MAX_DELAY_S}) * 1000000000
               AS arr
      FROM events),
    wm AS (
      SELECT event_id, user_id, ts_ns,
             MAX(ts_ns) OVER (ORDER BY arr, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prefix_max
      FROM e),
    k AS MATERIALIZED (
      -- referenced by two window passes in f; inlined, DuckDB re-runs the
      -- global prefix window per reference (house CTE-inlining trap)
      SELECT user_id, event_id, ts_ns,
             CASE WHEN prefix_max - {EP_WM_DELAY_NS}
                       >= ts_ns + {EPISODE_GAP_NS}
                  THEN 0 ELSE 1 END AS kept
      FROM wm),
    f AS (
      SELECT user_id, ts_ns, event_id, kept,
             CASE WHEN lag(ts_ns) OVER w IS NULL
                    OR ts_ns - lag(ts_ns) OVER w > {EPISODE_GAP_NS}
                  THEN 1 ELSE 0 END AS new_true,
             MAX(CASE WHEN kept = 1 THEN ts_ns END) OVER
                 (PARTITION BY user_id ORDER BY ts_ns, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_kept
      FROM k
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
    g AS (
      SELECT user_id, kept,
             CAST(SUM(new_true) OVER (PARTITION BY user_id
                                      ORDER BY ts_ns, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS true_idx,
             CASE WHEN kept = 1 AND (prev_kept IS NULL
                                     OR ts_ns - prev_kept > {EPISODE_GAP_NS})
                  THEN 1 ELSE 0 END AS new_surv
      FROM f),
    p AS (
      SELECT user_id, true_idx, COUNT(*) AS n,
             COUNT(CASE WHEN kept = 1 THEN 1 END) AS n_kept,
             CAST(SUM(new_surv) AS BIGINT) AS n_frag
      FROM g GROUP BY 1, 2)
    SELECT CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(n - n_kept) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) AS BIGINT) AS n_sessions_true,
           CAST(SUM(n_frag) AS BIGINT) AS n_sessions_surv,
           COUNT(CASE WHEN n_kept = 0 THEN 1 END) AS n_sessions_lost,
           CAST(SUM(CASE WHEN n_frag > 1 THEN n_frag - 1 ELSE 0 END)
                AS BIGINT) AS n_extra_fragments
    FROM p
    """,
)
def events_session_watermark_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SESSION-WINDOW × WATERMARK INTERACTION AUDIT (VERDICT r9
    next-round #4) — the streaming-semantics corner the tumbling-window
    ST4 audits don't pin: what watermark-dropped late rows do to
    GAP-BASED SESSIONS.  Dropping a row can (a) delete a singleton
    episode outright, and (b) SPLIT a longer episode whose neighbors it
    bridged — equivalently, each extra fragment is a session MERGE the
    streaming job forgoes because the bridging row arrived too late.

    The replay model is BOUNDED INGESTION DELAY, not the late-replay
    twin's full md5 permutation: each event arrives at
    ts + (md5_u32(event_id) % 86400) s — a deterministic 0..24 h
    delivery lag.  Under full permutation the watermark races to
    near-max immediately and >99 % of rows drop, every episode dies as
    a unit, and the split/merge signal this audit exists for is
    structurally zero (measured; the vacuity discipline) — bounded
    disorder is the regime where sessions are WOUNDED rather than
    killed.  Eviction is the conservative session-window rule: an
    arriving row whose candidate window [ts, ts+gap) is already closed
    by the watermark at its arrival (prefix_max − δ ≥ ts + gap) drops;
    merge-rescue by a still-open overlapping session state is not
    modeled (stated contract, pinned by the pure-Python streaming
    replay in tests/test_r10_features.py).  Real Spark 4.1 session
    windows under watermark — lag-one eviction, post-eviction drop,
    same-micro-batch merge-rescue — are pinned EXECUTABLE in
    tests/test_streaming.py::test_st34_* via streams.
    watermarked_sessions, making this audit the conservative bound on
    the streaming job's loss.

    Fragments nest inside true episodes (dropping rows only widens
    survivor gaps), so per-(user, episode) fragment counts compose
    exactly: n_sessions_surv = Σ n_frag and
    n_extra_fragments = Σ (n_frag − 1)⁺ — the declared split count.
    Measured (sf0.001/0.01/0.1): drops 187/3353/38569, episodes lost
    23/454/5738, extra fragments 28/376/3811 — all six columns
    non-vacuous at every SF.

    Scale shape: the global prefix max rides the shared THREE-LEVEL
    distributed prefix scan (:func:`_wm_prefix_frame`), bucketed by
    15-min arrival slices (monotone pure function of the order key, the
    stated contract); everything after is ONE user_id shuffle carrying
    three stacked windows over the same sort, a map-combined
    (user, episode) rollup, then a 1-row global agg.  Nothing funnels
    through one task except the ≤(span/15 min/64)-row L2 summary."""
    ev = load_tables(spark, sf_dir)["events"]
    arr = (
        F.col("ts_ns")
        + (md5_u32("event_id") % EP_MAX_DELAY_S) * F.lit(1_000_000_000)
    )
    e = ev.select("event_id", "user_id", "ts_ns").select(
        "*", arr.alias("arr")
    )
    # 15-min arrival slices: b1 pure + monotone in arr (the
    # _wm_prefix_frame contract); b2 groups 64 slices
    e = e.select(
        "*",
        F.expr("arr div 900000000000").alias("b1"),
        F.expr("arr div 900000000000 div 64").alias("b2"),
    )
    wm = _wm_prefix_frame(e, ["arr", "event_id"])
    kept = (
        F.when(
            F.col("prefix_max") - EP_WM_DELAY_NS
            >= F.col("ts_ns") + EPISODE_GAP_NS,
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("kept")
    )
    k = wm.select("user_id", "event_id", "ts_ns", kept)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    gap_prev = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_true = (
        F.when(
            F.lag("ts_ns").over(w).isNull()
            | (gap_prev > EPISODE_GAP_NS),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_true")
    )
    prev_kept = F.max(
        F.when(F.col("kept") == 1, F.col("ts_ns"))
    ).over(w_prev)
    f = k.select("user_id", "ts_ns", "event_id", "kept", new_true,
                 prev_kept.alias("prev_kept"))
    new_surv = F.when(
        (F.col("kept") == 1)
        & (
            F.col("prev_kept").isNull()
            | (F.col("ts_ns") - F.col("prev_kept") > EPISODE_GAP_NS)
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    g = f.select(
        "user_id",
        "kept",
        F.sum("new_true")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("true_idx"),
        new_surv.alias("new_surv"),
    )
    p = g.groupBy("user_id", "true_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("kept") == 1, F.lit(1))).alias("n_kept"),
        F.sum("new_surv").alias("n_frag"),
    )
    return p.agg(
        F.sum("n").alias("n_events"),
        F.sum(F.col("n") - F.col("n_kept")).alias("n_dropped"),
        F.count(F.lit(1)).alias("n_sessions_true"),
        F.sum("n_frag").alias("n_sessions_surv"),
        F.count(F.when(F.col("n_kept") == 0, F.lit(1))).alias(
            "n_sessions_lost"
        ),
        F.sum(
            F.when(F.col("n_frag") > 1, F.col("n_frag") - 1).otherwise(
                F.lit(0)
            )
        ).alias("n_extra_fragments"),
    )


def _count_series_sql(ns_per_bucket: int) -> str:
    """Single-source SQL twin of :func:`count_series` (shared by
    events_autocorr_minutes at minute grain and events_runs_test at hour
    grain).  MATERIALIZED is load-bearing: consumers reference b several
    times and DuckDB recomputes an inlined spine join per reference
    (measured 28 s -> 0.05 s at sf0.01)."""
    return f"""
    c AS MATERIALIZED (
      -- referenced by bounds AND b: inlined, DuckDB re-aggregates the
      -- events fact table per reference (house trap)
      SELECT epoch_ns(ts) // {ns_per_bucket} AS m, COUNT(*) AS x
      FROM events GROUP BY 1),
    bounds AS (SELECT MIN(m) AS lo, MAX(m) AS hi FROM c),
    spine AS (SELECT unnest(generate_series(lo, hi)) AS m FROM bounds),
    b AS MATERIALIZED (
      SELECT s.m, COALESCE(c.x, 0) AS x FROM spine s LEFT JOIN c USING (m))
"""


_MINUTE_NS = 60_000_000_000
_HOUR_NS = 3_600_000_000_000
_MINUTE_SERIES_SQL = _count_series_sql(_MINUTE_NS)


def count_series(
    spark: SparkSession, sf_dir: str, ns_per_bucket: int = _MINUTE_NS
) -> DataFrame:
    """Gapfilled per-time-bucket event-count series (m, x) — zero-filled
    between the observed bounds (gap buckets MUST exist or lagged /
    sequential statistics misalign).  The spine is generated, never
    shuffled; the result is localCheckpointed (non-eager) because every
    consumer fans it into several subplans that share nothing in
    Catalyst."""
    ev = load_tables(spark, sf_dir)["events"]
    cnt = ev.groupBy(F.expr(f"ts_ns div {ns_per_bucket}").alias("m")).agg(
        F.count(F.lit(1)).alias("x")
    )
    bounds = cnt.agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("m"))
    return (
        spine.join(cnt, "m", "left")
        .select("m", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
        .localCheckpoint(eager=False)
    )


@query(
    "events_overdispersion",
    oracle=f"""
    WITH {_MINUTE_SERIES_SQL},
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sk,
             CAST(SUM(x * x) AS BIGINT) AS sk2
      FROM b)
    SELECT n AS n_minutes, sk AS n_events, sk2 AS sum_sq,
           ROUND(CAST(n * sk2 - sk * sk AS DOUBLE)
                 / CAST((n - 1) * sk AS DOUBLE), 6) AS dispersion
    FROM t
    """,
)
def events_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON OVERDISPERSION INDEX of the per-minute arrival counts —
    the first diagnostic a capacity model runs: D = s²/x̄ over the
    gap-filled minute series (D ≈ 1 for a Poisson process; D > 1 means
    bursty arrivals, and every queueing estimate downstream must widen).
    Complements events_runs_test (sequence randomness) and
    events_autocorr_minutes (serial correlation) on the SAME shared
    :func:`count_series` spine — three declared lenses, one series
    definition that cannot drift.

    EXACT-INTEGER FORM: D = (n·Σx² − (Σx)²) / ((n−1)·Σx) — one IEEE
    division of two int64-exact products (numerator < 2^63 to ~1e5
    events/minute over a 30-day span; DuckDB's HUGEINT arithmetic is
    the overflow canary past that — rescale to per-second buckets
    first).  Scale shape: the series is one map-combined agg over a
    generated spine (n buckets is TIME-bounded, not corpus-bounded),
    then a 1-row rollup; the declared output is a single row."""
    b = count_series(spark, sf_dir)
    t = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sk"),
        F.sum(F.col("x") * F.col("x")).alias("sk2"),
    )
    n, sk, sk2 = F.col("n"), F.col("sk"), F.col("sk2")
    return t.select(
        n.alias("n_minutes"),
        sk.alias("n_events"),
        sk2.alias("sum_sq"),
        F.round(
            (n * sk2 - sk * sk).cast("double")
            / ((n - 1) * sk).cast("double"),
            6,
        ).alias("dispersion"),
    )


@query(
    "events_autocorr_minutes",
    oracle=f"""
    WITH {_MINUTE_SERIES_SQL},
    t AS (SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
          FROM b),
    ks AS (SELECT unnest(range(1, 6)) AS k),
    p AS (SELECT k.k, a.x AS x0, bb.x AS xl
          FROM b a JOIN ks k ON true JOIN b bb ON bb.m = a.m - k.k),
    num AS (SELECT k,
                   CAST(SUM((t.n * x0 - t.s) * (t.n * xl - t.s)) AS BIGINT)
                     AS num
            FROM p, t GROUP BY k),
    den AS (SELECT CAST(SUM((t.n * x - t.s) * (t.n * x - t.s)) AS BIGINT)
              AS den
            FROM b, t)
    SELECT CAST(num.k AS INT) AS k, t.n AS n_minutes, num.num, den.den,
           ROUND(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
    FROM num, den, t ORDER BY k
    """,
)
def events_autocorr_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-k AUTOCORRELATION (k = 1..5) of the per-minute event-count
    series — the seasonality/burstiness fingerprint next to
    events_seasonality_profile (which averages by clock position) and
    events_cusum_changepoint (level shifts): does traffic this minute
    predict the next?

    EXACT in the cusum n-scaled form: with S = Σx and n = spanned minutes,
    num_k = Σ (n·x_t − S)(n·x_{t+k} − S) and den = Σ (n·x_t − S)² are
    exact int64 (gap minutes MUST be zero-filled or lags misalign — the
    spine is generated, never shuffled), and acf = num/den is ONE IEEE
    division → ROUND(,6).  Overflow audit: n·max(x) ≲ S ⇒ terms ≤ S²·n ≈
    4·10¹⁶ at sf0.1 and ~4·10¹⁸ at 100× — past that widen to per-hour
    buckets or DECIMAL; DuckDB's HUGEINT sums are the canary.

    Plan: one hash agg to the minute series (bounded by the time span,
    never the row count), the series localCheckpointed once for its three
    consumers (stats, current, lagged — no common-subplan sharing in
    Catalyst otherwise), lags as ONE exploded shift-join on minute ids
    (shuffle on m, k a payload column — 5 lags cost one join, not five),
    moment scalars broadcast."""
    b = count_series(spark, sf_dir)
    t = b.agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    lag = b.withColumn(
        "k", F.explode(F.array(*[F.lit(k) for k in range(1, 6)]))
    ).select((F.col("m") + F.col("k")).alias("m"), "k", F.col("x").alias("xl"))
    dev0 = F.col("n") * F.col("x") - F.col("s")
    devl = F.col("n") * F.col("xl") - F.col("s")
    num = (
        b.join(lag, "m")
        .crossJoin(F.broadcast(t))
        .groupBy("k")
        .agg(F.sum(dev0 * devl).alias("num"))
    )
    den = (
        b.crossJoin(F.broadcast(t))
        .agg(F.sum(dev0 * dev0).alias("den"), F.max("n").alias("n_minutes"))
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("k").cast("int").alias("k"),
            "n_minutes",
            "num",
            "den",
            rnd(F.col("num").cast("double") / F.col("den").cast("double"), 6).alias(
                "acf"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("k")
    )


@query(
    "events_runs_test",
    oracle=f"""
    WITH {_count_series_sql(_HOUR_NS)},
    h AS (SELECT x AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
    f AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
                 SUM(cnt) OVER () AS n
          FROM h),
    md AS (SELECT v AS med FROM f
           WHERE cum >= (n + 1) // 2 ORDER BY v LIMIT 1),
    s AS (SELECT m, CASE WHEN x > med THEN 1 ELSE 0 END AS sgn
          FROM b, md WHERE x != med),
    q AS (SELECT sgn, LAG(sgn) OVER (ORDER BY m) AS prev FROM s),
    t AS (SELECT CAST(SUM(sgn) AS BIGINT) AS n1,
                 CAST(COUNT(*) - SUM(sgn) AS BIGINT) AS n2,
                 CAST(1 + COUNT(CASE WHEN sgn != prev THEN 1 END) AS BIGINT)
                   AS runs
          FROM q)
    SELECT md.med, t.n1, t.n2, t.runs,
           ROUND((CAST(t.runs AS DOUBLE)
                  - (CAST(2 * t.n1 * t.n2 AS DOUBLE)
                     / CAST(t.n1 + t.n2 AS DOUBLE) + 1.0))
                 / sqrt((CAST(2 * t.n1 * t.n2 AS DOUBLE)
                         / CAST(t.n1 + t.n2 AS DOUBLE))
                        * (CAST(2 * t.n1 * t.n2 AS DOUBLE)
                           / CAST(t.n1 + t.n2 AS DOUBLE) - 1.0)
                        / CAST(t.n1 + t.n2 - 1 AS DOUBLE)), 6) AS z
    FROM t, md
    """,
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST on the HOURLY traffic series — is the
    above/below-median sign sequence random, or does load cluster?
    (Hour grain, not minute: the minute series is mostly zeros at small
    SFs, its median is 0 and every survivor sits on one side — the test
    degenerates.  Hourly counts straddle their median at every SF.)  The
    randomness member of the nonparametric suite (Mann-Whitney location,
    KS distribution, Spearman association, runs randomness).

    Exact ingredients: the median is the (n+1) div 2 order statistic
    selected from the COUNT HISTOGRAM of series values (hist_selection
    machinery — the value domain is tiny, no row sort); minutes equal to
    the median are dropped (standard treatment); the run count is
    1 + #(adjacent sign flips) over the surviving sequence.  med, n1, n2,
    runs are exact int64; z is one structured double expression over them
    (mu = 2·n1·n2/N + 1, var = (mu−1)(mu−2)/(N−1)) → ROUND(,6).

    Scale shape: the sign sequence's positional index comes from the
    two-level prefix scan (in-bucket row_number partitioned by day —
    24 hours per bucket — exclusive day offsets over the ~30-row day
    summary, broadcast back),
    and adjacency is a seq+1 self-equi-join — the series never funnels
    through one task.  The DuckDB twin uses a plain LAG window, an
    intentionally different formulation of the same adjacency."""
    from paraslice_spark.operators.aggregates import (
        hist_at_rank,
        hist_selection_frame,
    )

    b = count_series(spark, sf_dir, _HOUR_NS)
    hist = (
        b.groupBy(F.col("x").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("g", F.lit(1))
    )
    med = (
        hist_selection_frame(hist, "g", "v")
        .groupBy("g")
        .agg(hist_at_rank("v", "(n + 1) div 2").alias("med"))
        .select("med")
    )
    s = (
        b.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("med"))
        .select(
            "m", "med", (F.col("x") > F.col("med")).cast("long").alias("sgn")
        )
        .withColumn("bkt", F.expr("m div 24"))
    )
    w_in = Window.partitionBy("bkt").orderBy("m")
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        s.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select("bkt", F.coalesce(F.sum("bn").over(w_b), F.lit(0)).alias("off"))
    )
    seqd = (
        s.join(F.broadcast(boff), "bkt")
        .select(
            "med",
            "sgn",
            (F.row_number().over(w_in) + F.col("off")).alias("seq"),
        )
        .localCheckpoint(eager=False)
    )
    nxt = seqd.select((F.col("seq") - 1).alias("seq"), F.col("sgn").alias("sgn_next"))
    flips = seqd.join(nxt, "seq").agg(
        F.sum((F.col("sgn") != F.col("sgn_next")).cast("long")).alias("nflip")
    )
    # GLOBAL aggregate, not groupBy(med): with zero surviving hours the
    # oracle's aggregate still emits one row (runs = 1, n1/n2 NULL); a
    # groupBy over the empty survivor table would emit none, and with a
    # single survivor the empty seq-join must yield runs = 1, not NULL —
    # both degenerate shapes mirror the oracle exactly (review finding)
    t = seqd.agg(
        F.sum("sgn").alias("n1"),
        (F.count(F.lit(1)) - F.sum("sgn")).alias("n2"),
    )
    out = (
        t.crossJoin(F.broadcast(flips))
        .crossJoin(F.broadcast(med))
        .select(
            "med",
            "n1",
            "n2",
            (F.lit(1) + F.coalesce(F.col("nflip"), F.lit(0))).alias("runs"),
        )
    )
    twon = (2 * F.col("n1") * F.col("n2")).cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    mu = twon / nd + 1.0
    var = (twon / nd) * (twon / nd - 1.0) / (F.col("n1") + F.col("n2") - 1).cast(
        "double"
    )
    return out.select(
        "med",
        "n1",
        "n2",
        "runs",
        rnd((F.col("runs").cast("double") - mu) / F.sqrt(var), 6).alias("z"),
    )


@query(
    "orders_backlog_profile",
    oracle="""
    WITH iv AS MATERIALIZED (
      -- referenced by starts/closes/bounds: inlined, DuckDB re-runs the
      -- order-close aggregation per reference (house trap)
      SELECT CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS sd,
             MAX(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01') + 1 AS ed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate),
    st AS (SELECT sd AS d, COUNT(*) AS ns FROM iv GROUP BY 1),
    cl AS (SELECT ed AS d, COUNT(*) AS nc FROM iv GROUP BY 1),
    bounds AS (SELECT MIN(sd) AS lo, MAX(ed) AS hi FROM iv),
    spine AS (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds),
    dd AS MATERIALIZED (
      SELECT s.d,
             SUM(COALESCE(st.ns, 0)) OVER (ORDER BY s.d)
               - SUM(COALESCE(cl.nc, 0)) OVER (ORDER BY s.d) AS backlog
      FROM spine s LEFT JOIN st USING (d) LEFT JOIN cl USING (d))
    SELECT CAST(year(DATE '1970-01-01' + CAST(d AS INT)) * 12
                + month(DATE '1970-01-01' + CAST(d AS INT)) AS BIGINT) AS ym,
           CAST(COUNT(*) AS BIGINT) AS days,
           CAST(MAX(backlog) AS BIGINT) AS max_backlog,
           ROUND(CAST(SUM(backlog) AS DOUBLE) / COUNT(*), 6) AS avg_backlog,
           CAST(MAX_BY(backlog, d) AS BIGINT) AS eom_backlog
    FROM dd GROUP BY 1 ORDER BY ym
    """,
)
def orders_backlog_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPEN-ORDER BACKLOG curve — how many orders were in flight each day
    (placed but not yet fully shipped), rolled up per calendar month: the
    operations-analytics WIP profile, the business-table sibling of
    events_session_concurrency's interval counting.  An order is open on
    day d iff o_orderdate <= d < (last l_shipdate + 1); orders with no
    line items never open (inner join — 257 such orders exist at sf0.01,
    stated so the rule is explicit).

    Exact: backlog(d) = cumulative(starts) − cumulative(closes), int64;
    per month the max, the day-count, the exact month-end level
    (MAX_BY over unique day ids — tie-free), and one display division
    for the average.  Integer epoch-day arithmetic on NTZ timestamps via
    datediff against the epoch (timezone-independent — the ship_latency
    NTZ pattern).

    Scale shape: the fact table collapses to per-order intervals (one
    shuffle on orderkey), then to two date histograms; the daily spine is
    CALENDAR-BOUNDED (~2500 rows for the 7-year fixture — the cusum
    time-axis discipline), so the ±1 prefix scan is one window over
    generated day rows, never order rows, and the monthly rollup is a
    vocabulary-sized hash agg."""
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    # r15 optimization (guide §2.3 "aggregate before you shuffle"): the
    # per-order last-ship date is a lineitem-only aggregate — collapsing
    # the fact to one row per order BEFORE the orders join removes the
    # former post-join 600k-row groupBy exchange and shrinks the join's
    # probe side to |orders|.  Inner-join semantics unchanged (orders
    # with no line items never open).
    ls = (
        t["lineitem"]
        .select("l_orderkey", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
    )
    iv = (
        t["orders"]
        .select("o_orderkey", "o_orderdate")
        .join(ls, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.datediff(F.col("o_orderdate").cast("date"), epoch).cast("long").alias("sd"),
            (F.datediff(F.col("last_ship"), epoch) + 1).cast("long").alias("ed"),
        )
        .localCheckpoint(eager=False)
    )
    st = iv.groupBy(F.col("sd").alias("d")).agg(F.count(F.lit(1)).alias("ns"))
    cl = iv.groupBy(F.col("ed").alias("d")).agg(F.count(F.lit(1)).alias("nc"))
    bounds = iv.agg(F.min("sd").alias("lo"), F.max("ed").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd = (
        spine.join(st, "d", "left")
        .join(cl, "d", "left")
        .select(
            "d",
            (
                F.sum(F.coalesce("ns", F.lit(0))).over(w)
                - F.sum(F.coalesce("nc", F.lit(0))).over(w)
            ).alias("backlog"),
        )
    )
    day_date = F.expr("date_add(DATE '1970-01-01', cast(d as int))")
    return (
        dd.groupBy(
            (F.year(day_date) * 12 + F.month(day_date)).cast("long").alias("ym")
        )
        .agg(
            F.count(F.lit(1)).alias("days"),
            F.max("backlog").alias("max_backlog"),
            rnd(F.sum("backlog").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_backlog"
            ),
            F.max_by("backlog", "d").alias("eom_backlog"),
        )
        .repartition(1)
        .sortWithinPartitions("ym")
    )


@query(
    "events_ohlc_hourly",
    oracle="""
    WITH v AS (
      SELECT epoch_ns(ts) // 3600000000000 AS hour,
             CAST(round(value * 1000000) AS BIGINT) AS mv,
             epoch_ns(ts) AS tsn, event_id
      FROM events),
    r AS (
      SELECT hour, mv,
             row_number() OVER (PARTITION BY hour
                                ORDER BY tsn, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY hour) AS n
      FROM v)
    SELECT hour, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = 1 THEN mv END) AS BIGINT) AS open_mic,
           CAST(MAX(mv) AS BIGINT) AS high_mic,
           CAST(MIN(mv) AS BIGINT) AS low_mic,
           CAST(MAX(CASE WHEN rn = n THEN mv END) AS BIGINT) AS close_mic,
           CAST(SUM(mv) AS BIGINT) AS vol_mic
    FROM r GROUP BY hour ORDER BY hour
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOURLY OHLC BARS over the event value stream — the financial
    candlestick aggregation (open / high / low / close / volume per
    hour): first and last are POSITIONAL aggregates, which hash-oracle
    only because the ordering is total — rows are ranked by
    (ts_ns, event_id), so duplicate timestamps (possible at µs grain)
    cannot flip the open/close pick.  All values are exact micro-unit
    int64; no float leaves the plan.

    Scale shape: one window pass partitioned by hour (partitions bounded
    by the busiest hour, shuffle keyed on the bar id), then a hash agg —
    the conditional rn=1/rn=n selection is the hist_at_rank SUM-selection
    idiom.  At stream time the same bar is the classic tumbling-window
    aggregate (stream_tumbling_counts's shape with positional extrema)."""
    ev = load_tables(spark, sf_dir)["events"]
    v = ev.select(
        F.expr("ts_ns div 3600000000000").alias("hour"),
        micros_units("value").alias("mv"),
        "ts_ns",
        "event_id",
    )
    w = Window.partitionBy("hour").orderBy("ts_ns", "event_id")
    wp = Window.partitionBy("hour")
    r = v.select(
        "hour",
        "mv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return (
        r.groupBy("hour")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("rn") == 1, F.col("mv"))).alias("open_mic"),
            F.max("mv").alias("high_mic"),
            F.min("mv").alias("low_mic"),
            F.max(F.when(F.col("rn") == F.col("n"), F.col("mv"))).alias(
                "close_mic"
            ),
            F.sum("mv").alias("vol_mic"),
        )
        .repartition(1)
        .sortWithinPartitions("hour")
    )


@query(
    "customer_reorder_gaps",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
             o_orderkey
      FROM orders),
    g AS (
      SELECT o_custkey,
             d - LAG(d) OVER (PARTITION BY o_custkey
                              ORDER BY d, o_orderkey) AS gap
      FROM o),
    h AS (
      SELECT c.c_mktsegment AS segment, g.gap, COUNT(*) AS cnt
      FROM g JOIN customer c ON c.c_custkey = g.o_custkey
      WHERE g.gap IS NOT NULL
      GROUP BY 1, 2),
    f AS (
      SELECT segment, gap, cnt,
             SUM(cnt) OVER (PARTITION BY segment ORDER BY gap) AS cum,
             SUM(cnt) OVER (PARTITION BY segment) AS n,
             SUM(gap * cnt) OVER (PARTITION BY segment) AS wsum
      FROM h)
    SELECT segment, CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum
                         THEN gap END) AS BIGINT) AS p50_days,
           CAST(SUM(CASE WHEN cum - cnt < (9 * n + 9) // 10
                          AND (9 * n + 9) // 10 <= cum
                         THEN gap END) AS BIGINT) AS p90_days,
           CAST(MAX(gap) AS BIGINT) AS max_days,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(n), 6) AS avg_days
    FROM f GROUP BY segment ORDER BY segment
    """,
)
def customer_reorder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORDER-INTERVAL PROFILE per market segment — how long between a
    customer's consecutive orders: the purchase-cadence statistic retail
    cohort models start from (sibling of events_interarrival_profile on
    the business table).  Gaps are exact epoch-day differences over a
    (date, orderkey)-ordered per-customer LAG — same-day repeat orders
    produce deterministic 0-day gaps regardless of tie order, because
    consecutive differences of a sorted multiset don't depend on how
    equal keys are arranged.  p50/p90 are exact nearest-rank order
    statistics selected from the per-segment GAP HISTOGRAM
    (hist_selection_frame machinery — no row sort), max exact, avg one
    display division.

    Scale shape: one shuffle on customer for the lag window
    (high-cardinality partitioning), customer dim broadcast for the
    segment label, then the histogram collapse — selection windows run
    over distinct gap values per segment, bounded by the gap-value
    vocabulary, never order rows."""
    from paraslice_spark.operators.aggregates import (
        hist_at_rank,
        hist_selection_frame,
    )

    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    o = t["orders"].select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), epoch).cast("long").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = o.select(
        "o_custkey", (F.col("d") - F.lag("d").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    h = (
        g.join(
            F.broadcast(
                t["customer"].select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_mktsegment").alias("segment"),
                )
            ),
            "o_custkey",
        )
        .groupBy("segment", F.col("gap").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    f = hist_selection_frame(h, "segment", "v").withColumn(
        "wsum", F.sum(F.col("v") * F.col("cnt")).over(Window.partitionBy("segment"))
    )
    return (
        f.groupBy("segment")
        .agg(
            F.max("n").alias("n_gaps"),
            hist_at_rank("v", "(n + 1) div 2").alias("p50_days"),
            hist_at_rank("v", "(9 * n + 9) div 10").alias("p90_days"),
            F.max("v").alias("max_days"),
            rnd(F.max("wsum").cast("double") / F.max("n"), 6).alias("avg_days"),
        )
        .repartition(1)
        .sortWithinPartitions("segment")
    )


@query(
    "events_value_drift_psi",
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT CAST(round(value * 1000000) AS BIGINT) // 2000000 AS bin,
             epoch_ns(ts) AS tsn
      FROM events),
    b AS (SELECT (MIN(tsn) + MAX(tsn)) // 2 AS mid FROM v),
    h AS MATERIALIZED (
      SELECT bin,
             COUNT(CASE WHEN tsn <= mid THEN 1 END) AS n_first,
             COUNT(CASE WHEN tsn > mid THEN 1 END) AS n_second
      FROM v, b GROUP BY bin),
    t AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
                 CAST(SUM(n_second) AS BIGINT) AS t2,
                 CAST(COUNT(*) AS BIGINT) AS nb
          FROM h)
    SELECT bin, CAST(n_first AS BIGINT) AS n_first,
           CAST(n_second AS BIGINT) AS n_second,
           ROUND((CAST(n_first + 1 AS DOUBLE) / CAST(t1 + nb AS DOUBLE)
                  - CAST(n_second + 1 AS DOUBLE) / CAST(t2 + nb AS DOUBLE))
                 * ln((CAST(n_first + 1 AS DOUBLE) / CAST(t1 + nb AS DOUBLE))
                      / (CAST(n_second + 1 AS DOUBLE)
                         / CAST(t2 + nb AS DOUBLE))), 6) AS psi_contrib
    FROM h, t ORDER BY bin
    """,
)
def events_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX — the standard ML-monitoring drift
    score: did the event-value distribution shift between the first and
    second half of the observation window?  Declared per BIN (exact
    first/second-half counts + the Laplace-smoothed PSI contribution
    (p−q)·ln(p/q)) so the verification rides exact integers; the total
    PSI is the consumer's one-line sum.  Smoothing (+1 per bin over
    total+n_bins) keeps empty-side bins finite and deterministic; ln is
    engine-stable in a ROUND(,6) single expression (tfidf precedent).

    Scale shape: fixed-width value bins (micro-units div 2e6 — no
    quantile pass), the time midpoint from one min/max agg broadcast
    back, then a single conditional hash agg to the bin histogram —
    everything after the scan is vocabulary-sized."""
    ev = load_tables(spark, sf_dir)["events"]
    v = ev.select(micros_units("value").alias("mv"), "ts_ns").select(
        F.expr("mv div 2000000").alias("bin"), "ts_ns"
    ).localCheckpoint(eager=False)
    b = v.agg(F.expr("(min(ts_ns) + max(ts_ns)) div 2").alias("mid"))
    h = (
        v.crossJoin(F.broadcast(b))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("ts_ns") <= F.col("mid"), 1)).alias("n_first"),
            F.count(F.when(F.col("ts_ns") > F.col("mid"), 1)).alias("n_second"),
        )
        .localCheckpoint(eager=False)
    )
    t = h.agg(
        F.sum("n_first").alias("t1"),
        F.sum("n_second").alias("t2"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = (F.col("n_first") + 1).cast("double") / (F.col("t1") + F.col("nb")).cast(
        "double"
    )
    q = (F.col("n_second") + 1).cast("double") / (F.col("t2") + F.col("nb")).cast(
        "double"
    )
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "bin",
            "n_first",
            "n_second",
            rnd((p - q) * F.log(p / q), 6).alias("psi_contrib"),
        )
        .repartition(1)
        .sortWithinPartitions("bin")
    )


_HAAR_N = 1024  # zero-padded series length (fixture spans 720 hours)


@query(
    "events_haar_energy",
    oracle=f"""
    WITH RECURSIVE
    c AS MATERIALIZED (
      SELECT epoch_ns(ts) // 3600000000000 AS m, COUNT(*) AS x
      FROM events GROUP BY 1),
    bounds AS (SELECT MIN(m) AS lo FROM c),
    spine AS (SELECT unnest(generate_series(0, {_HAAR_N - 1})) AS i),
    base AS MATERIALIZED (
      SELECT s.i, COALESCE(c.x, 0) AS v
      FROM spine s
      LEFT JOIN (SELECT m - lo AS i, x FROM c, bounds) c USING (i)),
    lv(lvl, i, s) AS (
        SELECT 0, i, v FROM base
      UNION ALL
        SELECT a.lvl + 1, a.i // 2, a.s + b.s
        FROM lv a JOIN lv b ON b.i = a.i + 1 AND a.i % 2 = 0
        WHERE a.lvl < 10
    ),
    en AS (
      SELECT a.lvl + 1 AS level,
             COUNT(*) AS n_coeffs,
             SUM((a.s - b.s) * (a.s - b.s)) AS energy
      FROM lv a JOIN lv b ON b.lvl = a.lvl AND b.i = a.i + 1
      WHERE a.i % 2 = 0
      GROUP BY 1),
    dc AS (SELECT 0 AS level, 1 AS n_coeffs, s * s AS energy
           FROM lv WHERE lvl = 10)
    SELECT CAST(level AS INT) AS level, CAST(n_coeffs AS BIGINT) AS n_coeffs,
           CAST(energy AS BIGINT) AS energy
    FROM (SELECT * FROM en UNION ALL SELECT * FROM dc)
    ORDER BY level
    """,
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAAR WAVELET ENERGY SPECTRUM of the hourly traffic series — the
    multi-resolution analysis operator: unnormalized Haar detail
    coefficients d_l(i) = s_(l-1)(2i) − s_(l-1)(2i+1) over the
    zero-padded 1024-point series, one row per level with the exact
    integer energy Σd² (level 1 = hour-to-hour roughness, level 10 =
    half-window imbalance, level 0 = the DC term squared).  Which time
    scale carries the variation is THE burstiness fingerprint — the
    frequency-domain sibling of events_autocorr_minutes.  Everything is
    int64 (unnormalized transform: sums and differences of counts), so
    the full spectrum hash-oracles; consumers normalize by 2^l.

    Spark plan (r15 optimization): the Haar detail at (level l, node j)
    is a SIGNED SUM of the leaves under node j — d_l(j) = Σ_{i div 2^l
    = j} s_i · sign(bit l−1 of i) — so the whole spectrum needs no
    level-by-level chain: each leaf explodes into 11 (level, node, ±s)
    contributions (level 0 = the DC sum with sign +1) and ONE
    groupBy(level, node) then ONE groupBy(level) produce every energy.
    2 tiny exchanges total (11·1024 rows) instead of the former 10
    sequential groupBy stages + 11 union branches (guide §2.4 — the
    chain was pure stage-count latency; measured 2.4 s → see
    OPTIMIZATION_r15.md).  n_coeffs per level is COUNT(*) of nodes —
    every node exists because the zero-padded spine materializes all
    1024 leaves.  DuckDB twin unchanged: a recursive CTE carrying the
    smooth coefficients.  Fixture span is 720 hours < N = 1024
    (assert-guarded); a longer-spanning deployment raises _HAAR_N to
    the next power of two."""
    b = count_series(spark, sf_dir, _HOUR_NS)
    # lazy span guard: assert_true rides the broadcast bounds row, so a
    # series longer than _HAAR_N fails AT EXECUTION instead of being
    # silently truncated by the spine join — and constructing the frame
    # stays side-effect-free (no eager count; review finding)
    bounds = b.agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
    guard = bounds.select(
        "lo",
        F.assert_true(
            (F.col("hi") - F.col("lo")) < F.lit(_HAAR_N),
            F.lit(f"hour span exceeds _HAAR_N={_HAAR_N}"),
        ).alias("_g"),
    )
    idx = b.crossJoin(F.broadcast(guard)).select(
        # folding the (always-null) guard into i keeps the assertion in
        # the plan — a plain dropped column would be pruned
        (F.col("m") - F.col("lo") + F.coalesce(F.col("_g").cast("long"), F.lit(0)))
        .alias("i"),
        F.col("x").alias("s"),
    )
    spine = spark.range(_HAAR_N).select(F.col("id").alias("i"))
    cur = (
        spine.join(idx, "i", "left")
        .select("i", F.coalesce("s", F.lit(0)).cast("long").alias("s"))
    )
    # sign-explode: leaf i contributes ±s to each level's covering node
    # (sign = bit l−1 of i; level 0 = the all-plus DC term).  i ≥ 0, so
    # the div/mod placement is the non-negative house form.
    entries = [
        F.struct(
            F.lit(0).cast("int").alias("level"),
            F.lit(0).cast("long").alias("node"),
            F.col("s").alias("cs"),
        )
    ]
    for lvl in range(1, 11):
        entries.append(
            F.struct(
                F.lit(lvl).cast("int").alias("level"),
                F.expr(f"i div {1 << lvl}").alias("node"),
                F.when(
                    F.expr(f"(i div {1 << (lvl - 1)}) % 2") == 0, F.col("s")
                )
                .otherwise(-F.col("s"))
                .alias("cs"),
            )
        )
    d = (
        cur.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.level", "e.node", "e.cs")
        .groupBy("level", "node")
        .agg(F.sum("cs").alias("d"))
    )
    out = d.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_coeffs"),
        F.sum(F.col("d") * F.col("d")).alias("energy"),
    )
    return out.select("level", "n_coeffs", "energy").repartition(
        1
    ).sortWithinPartitions("level")


@query(
    "customer_pareto_skyline",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS spend_c,
             CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                  AS BIGINT) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1),
    j AS (
      SELECT c.c_mktsegment, c.c_custkey, pc.spend_c, pc.last_day,
             pc.n_orders
      FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey),
    f AS (
      SELECT *,
             MAX(last_day) OVER (
               PARTITION BY c_mktsegment ORDER BY spend_c
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m1,
             MAX(last_day) OVER (
               PARTITION BY c_mktsegment ORDER BY spend_c
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m2
      FROM j)
    SELECT c_mktsegment, c_custkey,
           CAST(spend_c AS DOUBLE) / 100.0 AS spend, last_day, n_orders
    FROM f
    WHERE NOT (COALESCE(m1 >= last_day, FALSE) OR m2 > last_day)
    ORDER BY c_mktsegment, c_custkey
    """,
)
def customer_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO FRONT (SKYLINE) of customers per market segment on
    (total spend MAX, last-order recency MAX) — the dominance operator
    itself, the one relational shape the rest of the BI family lacks:
    a customer is on the front iff no same-segment customer both spent
    at least as much AND ordered at least as recently (one strictly
    better).  The account team's shortlist: every row is a distinct
    best-tradeoff between value and freshness (companion to
    customer_rfm_segments, which bins instead of dominating).

    SORT-BASED SKYLINE, NO SELF-JOIN: with two criteria, dominance
    collapses into two running-extreme RANGE-frame windows over the
    spend ordering — m1 = max(last_day) among strictly-higher spenders
    (RANGE 1 FOLLOWING → spend_c > mine, exact on integer cents),
    m2 = the same over spend_c ≥ mine — and a row survives iff neither
    m1 ≥ last_day nor m2 > last_day (equal (spend, recency) twins are
    mutually non-dominating and both kept; deterministic in both
    engines).  This is the textbook O(n log n) skyline; the quadratic
    NOT EXISTS formulation is the shape to avoid at scale.

    Scale shape: one map-combined orders agg to per-customer totals
    (exact cents, epoch-day recency — the reorder_gaps date rule), a
    key-to-key join to the customer dim for the segment, then windows
    PARTITIONED by segment over per-customer rows (already 6000×
    smaller than the fact table; the range sort is the skyline's
    honest cost).  Output is the per-segment front only (~tens of
    rows per segment at any SF)."""
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    pc = t["orders"].groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_c"),
        F.max(
            F.datediff(F.col("o_orderdate").cast("date"), epoch).cast("long")
        ).alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    j = pc.join(
        t["customer"].select("c_custkey", "c_mktsegment"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    base = Window.partitionBy("c_mktsegment").orderBy("spend_c")
    m1 = (
        F.max("last_day")
        .over(base.rangeBetween(1, Window.unboundedFollowing))
        .alias("m1")
    )
    m2 = (
        F.max("last_day")
        .over(base.rangeBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("m2")
    )
    f = j.select("c_mktsegment", "c_custkey", "spend_c", "last_day", "n_orders", m1, m2)
    dominated = F.coalesce(
        F.col("m1") >= F.col("last_day"), F.lit(False)
    ) | (F.col("m2") > F.col("last_day"))
    return (
        f.where(~dominated)
        .select(
            "c_mktsegment",
            "c_custkey",
            (F.col("spend_c").cast("double") / 100.0).alias("spend"),
            "last_day",
            "n_orders",
        )
        .repartition(1)
        .sortWithinPartitions("c_mktsegment", "c_custkey")
    )


@query(
    "events_theil_sen_trend",
    oracle=f"""
    WITH {_count_series_sql(_HOUR_NS)},
    lo AS (SELECT MIN(m) AS lo FROM b),
    bb AS MATERIALIZED (SELECT m - lo AS i, x FROM b, lo),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(i) AS BIGINT) AS sx,
             CAST(SUM(i * i) AS BIGINT) AS sxx,
             CAST(SUM(x) AS BIGINT) AS sy,
             CAST(SUM(i * x) AS BIGINT) AS sxy
      FROM bb),
    p AS (
      SELECT CAST(c.x - a.x AS DOUBLE) / CAST(c.i - a.i AS DOUBLE) AS slope
      FROM bb a JOIN bb c ON c.i > a.i),
    h AS (SELECT slope, CAST(COUNT(*) AS BIGINT) AS cnt FROM p GROUP BY 1),
    f AS (
      SELECT slope, cnt,
             SUM(cnt) OVER (ORDER BY slope) AS cum,
             SUM(cnt) OVER () AS np
      FROM h)
    SELECT (SELECT n FROM s) AS n_hours,
           CAST(MAX(np) AS BIGINT) AS n_pairs,
           ROUND(SUM(CASE WHEN cum - cnt < (np + 1) // 2
                           AND (np + 1) // 2 <= cum THEN slope END), 6)
             AS sen_slope,
           (SELECT ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE), 6) FROM s)
             AS ols_slope
    FROM f
    """,
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN ROBUST TREND of the hourly event-count series — the
    median of all pairwise slopes (y_j − y_i)/(j − i), the
    outlier-resistant trend estimator (29% breakdown point) printed
    NEXT TO the OLS slope from the same series: a capacity planner
    reads the gap between the two as "how much of the fitted growth is
    a handful of burst hours".  Third regression lens beside the corr/
    regr aggregates (agg_stats_bivariate) and the changepoint scan
    (events_cusum_changepoint), on the SAME :func:`count_series` spine
    as the runs-test — one series definition, four lenses.

    DETERMINISM: slopes are ONE IEEE division of two exact int64
    deltas (identical doubles in both engines → identical group keys);
    the median is an exact nearest-rank selection over the per-slope
    COUNT HISTOGRAM (hist_selection_frame machinery, rank (n+1) div 2
    — no interpolation, no float summation); the OLS slope is one IEEE
    division of two exact int64 moment products (x centered to
    0..H−1, so n·Sxy ≲ H³·max(x) — int64-safe to ~10⁶ hours at 10⁶
    events/hour; DuckDB's HUGEINT sums are the canary).

    Scale shape: the pair table is H(H−1)/2 rows where H is the HOUR
    SPAN — time-bounded, corpus-independent (720 h ⇒ 259k pairs
    whether the table is 60k rows or 100 TB; a multi-year span
    rebuckets to days first).  The series itself is one map-combined
    agg; the pair join and the histogram windows run on spine-sized
    frames only.  1 output row."""
    b = count_series(spark, sf_dir, _HOUR_NS)
    lo = b.agg(F.min("m").alias("lo"))
    bb = b.crossJoin(F.broadcast(lo)).select(
        (F.col("m") - F.col("lo")).alias("i"), "x"
    )
    s = bb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").alias("sx"),
        F.sum(F.col("i") * F.col("i")).alias("sxx"),
        F.sum("x").alias("sy"),
        F.sum(F.col("i") * F.col("x")).alias("sxy"),
    )
    a, c = bb.alias("a"), bb.alias("c")
    slope = (F.col("c.x") - F.col("a.x")).cast("double") / (
        F.col("c.i") - F.col("a.i")
    ).cast("double")
    hist = (
        a.join(c, F.col("c.i") > F.col("a.i"))
        .select(slope.alias("slope"))
        .groupBy("slope")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("g", F.lit(1))
    )
    from paraslice_spark.operators.aggregates import (
        hist_at_rank,
        hist_selection_frame,
    )

    sen = (
        hist_selection_frame(hist, "g", "slope")
        .groupBy("g")
        .agg(
            hist_at_rank("slope", "(n + 1) div 2").alias("sen_raw"),
            F.max("n").alias("n_pairs"),
        )
    )
    n, sx, sxx, sy, sxy = (F.col(k) for k in ("n", "sx", "sxx", "sy", "sxy"))
    return sen.crossJoin(F.broadcast(s)).select(
        n.alias("n_hours"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("sen_raw", 6).alias("sen_slope"),
        F.round(
            (n * sxy - sx * sy).cast("double")
            / (n * sxx - sx * sx).cast("double"),
            6,
        ).alias("ols_slope"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS t, event_id,
             CAST(round(value*1000000) AS BIGINT) AS mv
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')),
    w AS (
      SELECT *,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_t
      FROM e),
    p AS (
      SELECT CASE WHEN touch_t >= t - 604800000000000
                  THEN touch_type ELSE 'none' END AS touch,
             mv,
             CASE WHEN touch_t >= t - 604800000000000
                  THEN (t - touch_t) // 1000000000 END AS lat_s
      FROM w WHERE event_type = 'purchase')
    SELECT touch AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(mv) AS DOUBLE) / 1000000.0 AS total_value,
           ROUND(CAST(SUM(lat_s) AS DOUBLE) / COUNT(lat_s), 6)
             AS mean_latency_s
    FROM p GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH MARKETING ATTRIBUTION — every purchase credited to the
    user's most recent preceding view/click within a 7-day lookback
    (or 'none'): the conversion-credit table the funnel family stops
    short of (events_funnel counts who converts; this says which touch
    gets paid), plus the touch→purchase latency profile per channel.

    DETERMINISM: "most recent preceding" is a last_value(IGNORE NULLS)
    scan over the TOTAL (ts_ns, event_id) per-user order (the ohlc
    rule: µs ties cannot flip the pick because event_id breaks them,
    and ROWS … 1 PRECEDING makes a same-timestamp touch with a smaller
    event_id count as preceding in both engines identically); values
    are exact micro-units, latency an exact non-negative integer
    division to whole seconds, one IEEE division for the mean.

    Scale shape: ONE events scan with the type filter pushed down, one
    window pass PARTITIONED BY user (the sessionize shuffle — no self
    join, no per-purchase lookback scan), then a 3-row map-combined
    rollup.  The 7-day gate is a post-window comparison, so the state
    carried per user is O(1) — exactly the streaming-eviction shape
    events_watermark_late_audit prices."""
    ev = load_tables(spark, sf_dir)["events"]
    e = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.col("ts_ns").alias("t"),
        "event_id",
        micros_units("value").alias("mv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_t = F.when(F.col("event_type") != "purchase", F.col("t"))
    wd = e.select(
        "*",
        F.last(touch, ignorenulls=True).over(w).alias("touch_type"),
        F.last(touch_t, ignorenulls=True).over(w).alias("touch_t"),
    )
    in_window = F.col("touch_t") >= F.col("t") - F.lit(604_800_000_000_000)
    p = wd.where(F.col("event_type") == "purchase").select(
        F.when(in_window, F.col("touch_type")).otherwise("none").alias("touch"),
        "mv",
        F.when(in_window, F.expr("(t - touch_t) div 1000000000")).alias(
            "lat_s"
        ),
    )
    return (
        p.groupBy(F.col("touch").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum("mv").cast("double") / 1000000.0).alias("total_value"),
            F.round(
                F.sum("lat_s").cast("double") / F.count("lat_s"), 6
            ).alias("mean_latency_s"),
        )
        .repartition(1)
        .sortWithinPartitions("touch_type")
    )
