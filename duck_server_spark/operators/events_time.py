"""Time-series operators over the events stream table: AS-OF join,
tumbling-window bucketing, gap-based sessionization.

Reference parity: DuckDB 1.0 exposes ASOF JOIN and time bucketing through
the delegation surface (SURVEY.md §2B "Joins"). Spark has no ASOF
primitive → we implement the scalable idiom documented in SURVEY.md §2B:
union the two streams, carry the last build-side value forward with a
window — ONE shuffle on (user_id), no range-explosion join. At 100 TB
this beats the naive `a⋈b ON key AND b.ts <= a.ts` + argmax (which is
quadratic per key) and is exactly how production as-of joins are done on
Spark.

Determinism: ties at identical timestamps are broken (view-before-click,
then event_id) so the oracle's argmax-with-composite-key picks the same
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from duck_server_spark.engine.session import load_table


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'click' event: the value of the latest 'view' event by the
    same user at-or-before the click (inclusive AS-OF semantics)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")

    tagged = clicks.select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_click"), F.lit(None).cast("double").alias("view_value")
    ).unionByName(
        views.select(
            "user_id", "ts", "event_id", F.lit(0).alias("is_click"), F.col("value").alias("view_value")
        )
    )
    # views sort before clicks at equal ts (inclusive as-of); among equal-ts
    # views the largest event_id wins — mirrored in the oracle's argmax key.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_view_value", F.last("view_value", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(F.col("event_id").alias("click_id"), "user_id", "ts", "last_view_value")
    )


ASOF_JOIN_ORACLE = """
SELECT c.event_id AS click_id, c.user_id, c.ts,
       (SELECT arg_max(v.value, printf('%020d|%012d', epoch_us(v.ts), v.event_id))
        FROM events v
        WHERE v.event_type = 'view' AND v.user_id = c.user_id AND v.ts <= c.ts) AS last_view_value
FROM events c
WHERE c.event_type = 'click'
"""


def time_bucket_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows (batch twin of the streaming operator;
    Spark `window()` ≙ DuckDB `time_bucket`)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # DECIMAL(8,2) Spark-side (oracle keeps 18,2; round 13, guide
            # §2.3): event values are generator-bounded well under 10^6,
            # so the sum accumulator stays on the compact-long decimal.
            F.sum(F.col("value").cast("decimal(8,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n", "sum_value")
    )


TIME_BUCKET_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity ends a session):
    classic lag → new-session flag → running sum → session_id, then
    per-session stats. One shuffle on user_id; the cumulative sum is
    per-user-partition — the standard scalable sessionization on Spark."""
    # NTZ-tolerant: unix_micros requires TIMESTAMP; a TIMESTAMP_NTZ ts
    # (micros/isAdjustedToUTC=false fixtures) casts losslessly under the
    # UTC session TZ. No-op when load_table already normalized.
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    with_gap = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.unix_micros("ts") - F.unix_micros("prev_ts")) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    with_sid = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000)).alias("duration_s"),
        )
    )


SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
  FROM events
), f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM g
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM f
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000 AS duration_s
FROM s GROUP BY user_id, session_seq
"""


# ASOF JOIN as SQL TEXT (round 6): the exact DuckDB 1.0 syntax a client
# sends through the reference's delegation points
# (/root/reference/README.md:26). The Spark side runs the dialect shim
# (plans/rewrites.py rewrite_asof_join → validity-interval equi-join, one
# shuffle per side on user_id); the oracle runs the SAME text natively on
# DuckDB — hash equality proves the rewrite's semantics. The right side
# is pre-aggregated per (user_id, ts) so as-of ties are impossible and
# both engines pick the identical row.
ASOF_JOIN_SQL_TEXT = """
SELECT c.click_id, c.user_id, c.ts, v.vts AS view_ts, v.vval AS view_value
FROM (
  SELECT event_id AS click_id, user_id, ts
  FROM events WHERE event_type = 'click'
) c
ASOF LEFT JOIN (
  SELECT user_id AS vuser, ts AS vts, max(value) AS vval
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
) v ON c.user_id = v.vuser AND c.ts >= v.vts
"""


def asof_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text twin of asof_join: exercises the ASOF JOIN dialect
    shim end-to-end (rewrite → Spark plan) against DuckDB running the
    identical statement natively."""
    from duck_server_spark.engine.session import register_views
    from duck_server_spark.plans import rewrites

    register_views(spark, sf_dir)
    return spark.sql(rewrites.rewrite_pg_query(ASOF_JOIN_SQL_TEXT))


QUERIES = {
    "asof_join": asof_join,
    "asof_join_sql": asof_join_sql,
    "time_bucket_tumbling": time_bucket_tumbling,
    "sessionize": sessionize,
}

ORACLE = {
    "asof_join": ASOF_JOIN_ORACLE,
    "asof_join_sql": ASOF_JOIN_SQL_TEXT,
    "time_bucket_tumbling": TIME_BUCKET_TUMBLING_ORACLE,
    "sessionize": SESSIONIZE_ORACLE,
}


def attributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to a same-user click within the preceding
    hour (the batch twin of streaming.windows.click_purchase_join).
    Equi-join on user_id with an interval residual — Catalyst plans the
    hash join on the key and filters the time band, never a range
    explosion; the 1-hour band keeps the pair set bounded at every
    SF."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    return (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            F.col("amount").cast("decimal(18,2)").cast("double").alias("amount"),
        )
    )


ATTRIBUTED_PURCHASES_ORACLE = """
WITH ev AS (SELECT * FROM events),
c AS (
  SELECT user_id AS c_user, ts AS click_ts, event_id AS click_id
  FROM ev WHERE event_type = 'click'
),
p AS (
  SELECT user_id AS p_user, ts AS purchase_ts, event_id AS purchase_id, value AS amount
  FROM ev WHERE event_type = 'purchase'
)
SELECT c_user AS user_id, click_id, purchase_id,
       CAST(CAST(amount AS DECIMAL(18,2)) AS DOUBLE) AS amount
FROM c JOIN p
  ON c_user = p_user
 AND purchase_ts >= click_ts
 AND purchase_ts <= click_ts + INTERVAL 1 HOUR
"""

QUERIES["attributed_purchases"] = attributed_purchases
ORACLE["attributed_purchases"] = ATTRIBUTED_PURCHASES_ORACLE


_FUNNEL_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS t_signup
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t_signup
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT 1 AS stage, 'signup' AS step, (SELECT count(*) FROM s) AS users
UNION ALL
SELECT 2 AS stage, 'click_after_signup' AS step, (SELECT count(*) FROM c) AS users
UNION ALL
SELECT 3 AS stage, 'purchase_after_click' AS step, (SELECT count(*) FROM p) AS users
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → click → purchase): each stage is the
    users whose stage event strictly follows their previous stage's
    first event. Product-analytics staple. Scale shape: three
    hash-aggregates on user_id (same shuffle key reused — Spark AQE
    co-partitions the chain), never a per-user sort or array collect."""
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(_FUNNEL_SQL)


QUERIES["events_funnel"] = events_funnel
ORACLE["events_funnel"] = _FUNNEL_SQL


# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------

def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity streaks (the classic gaps-and-islands shape):
    distinct active days, number of maximal consecutive-day runs, and
    the longest run. Island key = day_number - row_number, computed as
    pure integer arithmetic from a fixed epoch so both engines agree
    without dialect-specific date math.

    Scale shape: one shuffle on user_id covers the distinct, the window
    numbering, and the island aggregation (same key reused end-to-end);
    no self-join, no per-user array collect."""
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
numbered AS (
  SELECT user_id, d,
         datediff(d, DATE '2024-01-01') AS dn,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
),
islands AS (
  SELECT user_id, dn - rn AS grp, count(*) AS streak_len
  FROM numbered GROUP BY user_id, dn - rn
)
SELECT user_id,
       CAST(sum(streak_len) AS BIGINT) AS n_active_days,
       count(*) AS n_streaks,
       CAST(max(streak_len) AS BIGINT) AS longest_streak
FROM islands GROUP BY user_id
""")


EVENTS_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
numbered AS (
  SELECT user_id, d,
         datediff('day', DATE '2024-01-01', d) AS dn,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
),
islands AS (
  SELECT user_id, dn - rn AS grp, count(*) AS streak_len
  FROM numbered GROUP BY user_id, dn - rn
)
SELECT user_id,
       CAST(sum(streak_len) AS BIGINT) AS n_active_days,
       count(*) AS n_streaks,
       CAST(max(streak_len) AS BIGINT) AS longest_streak
FROM islands GROUP BY user_id
"""

QUERIES["events_streaks"] = events_streaks
ORACLE["events_streaks"] = EVENTS_STREAKS_ORACLE


# ---------------------------------------------------------------------------
# Z-score anomaly detection over event values
# ---------------------------------------------------------------------------

def events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type z-score outliers (|z| > 2): the metric-anomaly
    pass over an event stream. Moments are accumulated as exact
    fixed-point integers (floor(value·1e6) — one correctly-rounded IEEE
    multiply then an exact floor on both engines) so the mean/std, and
    therefore every z-score, are bit-equal at any parallelism; see
    aggregates.agg_stats_moments for why scale-0 decimal sums are the
    only cross-engine-safe formulation.

    Scale shape: one map-side-combined shuffle onto ~4 event_type keys
    for the moments, then a broadcast join back onto the stream — the
    fact table is scanned twice but never shuffled."""
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
WITH ev AS (
  SELECT event_id, event_type, value,
         CAST(CAST(floor(value * 1000000) AS BIGINT) AS DECIMAL(18,0)) AS fv
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(fv) AS DOUBLE) AS s,
         CAST(sum(CAST(fv * fv AS DECIMAL(38,0))) AS DOUBLE) AS ss
  FROM ev GROUP BY event_type
)
SELECT event_id, ev.event_type, value,
       (CAST(fv AS DOUBLE) - s / n) / sqrt((ss - s * s / n) / (n - 1.0)) AS zscore
FROM ev JOIN m ON ev.event_type = m.event_type
WHERE abs((CAST(fv AS DOUBLE) - s / n) / sqrt((ss - s * s / n) / (n - 1.0))) > 2.0
""")


EVENTS_OUTLIERS_ORACLE = """
WITH ev AS (
  SELECT event_id, event_type, value,
         CAST(CAST(floor(value * 1000000) AS BIGINT) AS DECIMAL(18,0)) AS fv
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(fv) AS DOUBLE) AS s,
         CAST(sum(CAST(fv * fv AS DECIMAL(38,0))) AS DOUBLE) AS ss
  FROM ev GROUP BY event_type
)
SELECT event_id, ev.event_type, value,
       (CAST(fv AS DOUBLE) - s / n) / sqrt((ss - s * s / n) / (n - 1.0)) AS zscore
FROM ev JOIN m ON ev.event_type = m.event_type
WHERE abs((CAST(fv AS DOUBLE) - s / n) / sqrt((ss - s * s / n) / (n - 1.0))) > 2.0
"""

QUERIES["events_outliers"] = events_outliers
ORACLE["events_outliers"] = EVENTS_OUTLIERS_ORACLE


# ---------------------------------------------------------------------------
# Gap filling / forward interpolation over a date spine
# ---------------------------------------------------------------------------

def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user value series with gaps filled by the last
    observation (time-series densification — the feed-a-model-regular-
    intervals op). A date spine generates every (user, day) in the
    user's active range, left-joins the observed daily sums, and
    forward-fills with last_value(IGNORE NULLS) over the date order.

    Scale shape: the spine explodes only each user's own [first, last]
    activity range (not the global calendar cross-join), and the fill
    is ONE window shuffle on user_id. Spine size is bounded by
    users × days-span, independent of event volume."""
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(CAST(floor(value * 100) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 100 AS day_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
),
spans AS (
  SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, explode(sequence(d0, d1)) AS d FROM spans
)
SELECT s.user_id, CAST(s.d AS STRING) AS d,
       last_value(daily.day_value, true)
         OVER (PARTITION BY s.user_id ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       CASE WHEN daily.day_value IS NULL THEN 1 ELSE 0 END AS was_gap
FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
""")


EVENTS_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(CAST(floor(value * 100) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 100 AS day_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
),
spans AS (
  SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d FROM spans
)
SELECT s.user_id, CAST(s.d AS VARCHAR) AS d,
       last_value(daily.day_value IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       CASE WHEN daily.day_value IS NULL THEN 1 ELSE 0 END AS was_gap
FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
"""

QUERIES["events_gapfill"] = events_gapfill
ORACLE["events_gapfill"] = EVENTS_GAPFILL_ORACLE


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted by how many return in each subsequent week offset — the
    canonical product-analytics matrix. Two aggregations on user_id
    (cohort assignment, activity weeks) and one on (cohort, offset);
    exact integer math throughout (weekofyear dialects differ, so weeks
    are day-number / 7 from a fixed epoch)."""
    from duck_server_spark.engine.session import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
WITH weeks AS (
  SELECT user_id, CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7 AS INT) AS w
  FROM events GROUP BY user_id, CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') / 7 AS INT)
),
cohorts AS (
  SELECT user_id, min(w) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week, w.w - c.cohort_week AS week_offset,
       count(*) AS active_users
FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY c.cohort_week, w.w - c.cohort_week
""")


COHORT_RETENTION_ORACLE = """
WITH weeks AS (
  SELECT user_id, CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT) AS w
  FROM events GROUP BY user_id, CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT)
),
cohorts AS (
  SELECT user_id, min(w) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT c.cohort_week, w.w - c.cohort_week AS week_offset,
       count(*) AS active_users
FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY c.cohort_week, w.w - c.cohort_week
"""

QUERIES["cohort_retention"] = cohort_retention
ORACLE["cohort_retention"] = COHORT_RETENTION_ORACLE
