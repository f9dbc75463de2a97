"""Event-time windowed aggregation over the ``events`` stream table.

Milvus itself has no windowed computation (SURVEY §2.6 — its "streaming" is
ingest ordering/consistency, internal/streamingnode/server/wal/). These are
the Spark-native extensions a training-data/event pipeline needs; the same
expressions run under Structured Streaming with ``withWatermark`` for late
data (streaming/ingest.py exposes that path).

Scale notes: tumbling windows are a plain groupBy on a derived bucket —
map-side partial agg; session windows shuffle once on the key then run a
gaps-and-islands scan within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from milvus_spark.registry import register
from milvus_spark.session import load_table


# --- tumbling window ----------------------------------------------------------
@register(
    "win_tumbling_daily",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumbling_daily(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("day"), "event_type", "n", "total_value")
    )


# --- sliding window -----------------------------------------------------------
@register(
    "win_sliding_2d_1d",
    oracle="""
    WITH buckets AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day, value
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM buckets),
    slid AS (
      SELECT d.day AS win_start, CAST(count(b.value) AS BIGINT) AS n
      FROM days d JOIN buckets b
        ON b.day >= d.day AND b.day < d.day + INTERVAL 2 DAY
      GROUP BY d.day
    )
    SELECT win_start, n FROM slid
    """,
)
def win_sliding_2d_1d(spark: SparkSession, sf: str) -> DataFrame:
    """2-day windows sliding by 1 day. Spark's window() emits one row per
    covering window; the oracle enumerates day starts — both count each event
    in the ≤2 windows covering it. Windows with zero events don't appear.
    Spark also emits the window starting the day BEFORE the first event; the
    oracle join is restricted to starts that are observed days, so align by
    filtering Spark to the same starts."""
    e = load_table(spark, sf, "events")
    slid = (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )
    days = e.select(F.date_trunc("day", "ts").alias("win_start")).distinct()
    return slid.join(F.broadcast(days), "win_start")


# --- session window (30-minute gap) per user ----------------------------------
@register(
    "win_session_gap",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM ordered
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS sess_start
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def win_session_gap(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows via gaps-and-islands (deterministic, oracle-exact;
    Spark's native session_window() merges identically but labels sessions
    by start time — the island id here keeps both engines aligned)."""
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # microsecond precision on both sides (a plain cast("long") truncates to
    # seconds and can disagree with the oracle on fractional-second gaps)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    new_sess = F.when(prev.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sess = e.withColumn("new_sess", new_sess).withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("sess_start")
    )


# --- distinct aggregation (Spark-native extra; exact, SQL-expressible) --------
@register(
    "win_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def win_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events")
    )


# --- funnel analysis: ordered step completion ----------------------------------
@register(
    "win_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
      GROUP BY 1
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v JOIN c ON v.user_id = c.user_id JOIN p ON c.user_id = p.user_id
    """,
)
def win_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel completion (view → click → purchase): first view,
    first click strictly after it, first purchase strictly after that —
    per-user event-sequence analytics. Each step is one groupBy on
    user_id (map-side partial min) co-partitioned with the next step's
    join, so the whole funnel reuses a single shuffle key — the shape that
    survives a billion-user event log."""
    e = load_table(spark, sf, "events").select("user_id", "ts", "event_type")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v.join(c, "user_id").join(p, "user_id").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


# --- cohort retention ----------------------------------------------------------
@register(
    "win_cohort_retention",
    oracle="""
    WITH firstday AS (
      SELECT user_id,
             CAST(date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             date_diff('day', f.cohort, date_trunc('day', CAST(e.ts AS TIMESTAMP))) AS day_offset
      FROM events e JOIN firstday f ON e.user_id = f.user_id
    )
    SELECT cohort, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity GROUP BY 1, 2
    """,
)
def win_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted as
    active per day-offset from their cohort — the engagement matrix every
    event pipeline reports. Two aggregations on user_id (map-side partial
    min, then distinct day offsets), final count keyed on the bounded
    (cohort, offset) grid; the user-keyed shuffle is reused by the join."""
    e = load_table(spark, sf, "events").select("user_id", "ts")
    day = F.date_trunc("day", F.col("ts"))
    firstday = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    activity = (
        e.join(firstday, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(day, F.col("cohort")).cast("long").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "day_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


# --- ASOF join: last click at-or-before each error ----------------------------
@register(
    "win_asof_last_click",
    oracle="""
    SELECT e.event_id, e.user_id, c.event_id AS click_id,
           CAST(date_diff('microsecond', c.ts, e.ts) AS BIGINT) AS gap_us,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND c.ts <= e.ts
    """,
)
def win_asof_last_click(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF join: for every error event, the user's most recent click at or
    before it (NULLs when none) — the temporal-join primitive Spark lacks as
    a keyword and a training/event pipeline constantly needs.

    Plan: the union-marker technique, NOT an inequality join. Both sides
    union into one frame tagged src(0=click, 1=error); ONE shuffle on
    user_id, then a running `last(..., ignorenulls)` over (ts, src) carries
    the latest click's attributes forward INSIDE each partition; errors
    filter out with their answer attached. Ordering (ts, src) puts a click
    before an error at the same timestamp — the inclusive `c.ts <= e.ts` of
    the oracle's ASOF JOIN. Linear in events, skew-bounded by per-user
    volume; the naive formulation is an inequality join Spark can only
    nested-loop or sort-merge-range."""
    e = load_table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(0).alias("src"),
        F.col("event_id").alias("cid"),
        F.col("value").alias("cval"),
        F.lit(None).cast("long").alias("eid"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts",
        F.lit(1).alias("src"),
        F.lit(None).cast("long").alias("cid"),
        F.lit(None).cast("double").alias("cval"),
        F.col("event_id").alias("eid"),
    )
    u = clicks.unionByName(errors)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        u.withColumn("click_id", F.last("cid", ignorenulls=True).over(w))
        .withColumn(
            "click_ts",
            F.last(F.when(F.col("src") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .withColumn("click_value", F.last("cval", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
    )
    return out.select(
        F.col("eid").alias("event_id"),
        "user_id",
        "click_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).cast("long").alias("gap_us"),
        "click_value",
    )


# --- range join: clicks within ±5 minutes of each error -----------------------
@register(
    "win_range_join_nearby",
    oracle="""
    SELECT e.event_id, e.user_id, CAST(count(c.ts) AS BIGINT) AS n_nearby
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
    GROUP BY 1, 2
    """,
)
def win_range_join_nearby(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join: clicks within ±5 minutes of each error for the
    same user, realized as a BUCKETED EQUI-join — the scale path for a
    predicate Spark would otherwise nested-loop.

    Each click replicates to its time bucket and both neighbors (bucket
    width = the radius, so every within-radius pair shares a bucket with
    exactly ONE replica — no double counting, no missed pair); the join is
    then a plain (user_id, bucket) equi-join with the exact |Δt| ≤ 5 min
    predicate applied in-join. Shuffle volume is 3× clicks + errors,
    independent of the time span; all arithmetic is integer microseconds —
    exact on both engines."""
    e = load_table(spark, sf, "events")
    radius_us = 300_000_000
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("eus"),
        F.floor(F.unix_micros("ts") / radius_us).alias("b"),
    )
    cb = F.floor(F.unix_micros("ts") / radius_us)
    clk = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("cu"),
            F.unix_micros("ts").alias("cus"),
            F.explode(F.array(cb - 1, cb, cb + 1)).alias("cbkt"),
        )
    )
    cond = (
        (err.user_id == clk.cu)
        & (err.b == clk.cbkt)
        & (F.abs(err.eus - clk.cus) <= radius_us)
    )
    return (
        err.join(clk, cond, "left")
        .groupBy("event_id", "user_id")
        .agg(F.count("cus").alias("n_nearby"))
    )


# --- running totals + lag deltas per customer ---------------------------------
@register(
    "win_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) + 0 AS running,
           round(o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) + 0 AS delta_prev
    FROM orders
    WHERE o_custkey % 97 = 0
    """,
)
def win_running_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Per-customer running revenue + order-over-order delta — the
    cumulative/lag window pair every analytics migration expects. One
    shuffle on the customer key; both windows share the same frame sort, so
    Spark evaluates them in a single Window operator pass (bounded by
    per-customer order counts, never a global sort)."""
    o = load_table(spark, sf, "orders").filter(F.col("o_custkey") % 97 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = F.round(
        F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
    ) + F.lit(0.0)
    delta = F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2) + F.lit(0.0)
    return o.select(
        "o_custkey", "o_orderkey", running.alias("running"), delta.alias("delta_prev")
    )


# --- rolling z-score anomaly flags --------------------------------------------
@register(
    "win_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             sum(value) AS total
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, day, total,
             avg(total) OVER w AS mu,
             stddev(total) OVER w AS sd
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day,
           round(total, 4) + 0 AS total,
           round((total - mu) / sd, 4) + 0 AS z,
           CAST(abs((total - mu) / sd) > 2 AS BOOLEAN) AS is_anomaly
    FROM stats WHERE sd IS NOT NULL AND sd > 0
    """,
)
def win_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score anomaly detection on daily per-type volume: each
    day scores against the TRAILING 3-day window (excluding itself, so a
    spike can't mask its own detection). The event-pipeline alerting
    primitive; the same expressions run under Structured Streaming with a
    watermarked window. One shuffle on event_type for the daily agg; the
    rolling frame is bounded (3 rows) per partition."""
    e = load_table(spark, sf, "events")
    daily = (
        e.groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(F.sum("value").alias("total"))
        .select("event_type", F.col("w.start").alias("day"), "total")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, -1)
    )
    st = daily.select(
        "event_type", "day", "total",
        F.avg("total").over(w).alias("mu"),
        F.stddev("total").over(w).alias("sd"),
    )
    z = (F.col("total") - F.col("mu")) / F.col("sd")
    return st.filter(F.col("sd").isNotNull() & (F.col("sd") > 0)).select(
        "event_type", "day",
        (F.round("total", 4) + F.lit(0.0)).alias("total"),
        (F.round(z, 4) + F.lit(0.0)).alias("z"),
        (F.abs(z) > 2).alias("is_anomaly"),
    )


# --- top-k per window: leading users per day ----------------------------------
@register(
    "win_topk_per_day",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             user_id,
             round(sum(value), 2) + 0 AS total
      FROM events GROUP BY 1, 2
    )
    SELECT day, user_id, total, rnk FROM (
      SELECT day, user_id, total,
             CAST(row_number() OVER (
               PARTITION BY day ORDER BY total DESC, user_id
             ) AS BIGINT) AS rnk
      FROM daily
    ) WHERE rnk <= 3
    """,
)
def win_topk_per_day(spark: SparkSession, sf: str) -> DataFrame:
    """Leaderboard: top-3 users per day by event value — per-window ranked
    top-k (daily keyed agg, then a rank window whose partition is one day,
    never a global sort; ranking on the ROUNDED total so both engines cut
    identical ties)."""
    e = load_table(spark, sf, "events")
    daily = (
        e.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg((F.round(F.sum("value"), 2) + F.lit(0.0)).alias("total"))
        .select(F.col("w.start").alias("day"), "user_id", "total")
    )
    w = W.partitionBy("day").orderBy(F.col("total").desc(), F.col("user_id").asc())
    return (
        daily.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("day", "user_id", "total", "rnk")
    )


# --- rolling 7-day active users (WAU) -----------------------------------------
@register(
    "win_weekly_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d JOIN du u
      ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
    GROUP BY d.day
    """,
)
def win_weekly_active_users(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 7-day distinct actives per day (WAU) — the sliding DISTINCT
    no window frame expresses directly. Plan: dedupe to (day, user) pairs
    first (the only corpus-sized shuffle), then EXPLODE each pair into the
    ≤7 future days it contributes to (pure map, 7× row fan-out independent
    of history length), broadcast-semi-join against the tiny set of
    observed days, and finish with one keyed count_distinct. No range
    join, no nested loop: work is O(7 · |deduped pairs|), not
    O(|days| × |pairs|) — the shape that survives a 10-year corpus."""
    e = load_table(spark, sf, "events")
    du = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
