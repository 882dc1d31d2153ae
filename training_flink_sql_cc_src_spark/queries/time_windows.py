"""Event-time windowing [B] (SURVEY.md §2.4 window TVFs, §2.6; lab-time
README.md:8 — the watermark DDL S9/S10 at terraform/lab-joins/main.tf:531,564
is the precondition for every operator here).

Flink window TVFs → Spark: TUMBLE → ``F.window(ts, size)``, HOP →
``F.window(ts, size, slide)``, SESSION → ``F.session_window``, CUMULATE →
explicit expansion (no Spark native; explode the growing-window index then
aggregate — still one shuffle, identical to what Flink's cumulate does
internally with slice-state).

Window boundaries are emitted as BIGINT epoch seconds so the value hash is
independent of timestamp type/timezone representation (registry rule).

Scale notes: every query is scan → (map-side expand) → one hash shuffle on
(window, key) → partial+final agg. Window structs are computed JVM-side in
whole-stage codegen; nothing here touches Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import DSUM_SQL, dsum, t

EPOCH_SQL = "CAST(FLOOR(EPOCH({x})) AS BIGINT)"


@register(
    "window_tumble",
    oracle=f"""
    SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(x='value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR) — fixed "
    "1-hour windows per event_type. Spark: F.window(ts, '1 hour'); "
    "boundaries floor to the hour so both engines bucket identically.",
)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_hop",
    oracle=f"""
    SELECT ((({EPOCH_SQL.format(x='e.ts')} - k.off) // 3600) * 3600 + k.off)
               AS window_start,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(x='e.value')} AS sum_value
    FROM events e
    CROSS JOIN (VALUES (0), (900), (1800), (2700)) AS k(off)
    GROUP BY 1
    """,
    doc="HOP(TABLE events, DESCRIPTOR(ts), slide 15 min, size 1 hour) — "
    "sliding windows; each event lands in 4 windows. Spark: "
    "F.window(ts, '1 hour', '15 minutes') expands map-side then one "
    "shuffle. Oracle expands via a 4-row VALUES cross join: for offset "
    "k∈{0,900,1800,2700}, the window start is the k-shifted 900s floor — "
    "the same 4 window starts Spark assigns.",
)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 10 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
           CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) AS session_last,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), gap 10 "
    "min). Spark: F.session_window(ts, '10 minutes') — native merging "
    "session windows (one shuffle on user_id). Oracle: classic gaps-and-"
    "islands (LAG + running sum). session_last = MAX(ts) floor-epoch; "
    "Spark's session end is last+gap, so we emit last = end - gap.",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            F.col("last_ts").cast("long").alias("session_last"),
            "n_events",
        )
    )


@register(
    "window_session_sql",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 10 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
           CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) AS session_last,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="SESSION TVF through the SQL front door: the lab-time statement "
    "syntax TABLE(SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts), gap)) "
    "is accepted verbatim by the StatementRouter, which rewrites it into "
    "the gaps-and-islands derived table (LAG gap flag → running-sum "
    "session id → per-session min/max) — same oracle as window_session. "
    "Plan: two window functions over one shuffle on user_id, then the "
    "group-by reuses the same partitioning.",
)
def window_session_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__sess_sql_events")
    return StatementRouter(spark).execute(
        "SELECT user_id, CAST(window_start AS LONG) AS session_start, "
        "CAST(MAX(ts) AS LONG) AS session_last, COUNT(*) AS n_events "
        "FROM TABLE(SESSION(TABLE __sess_sql_events PARTITION BY user_id, "
        "DESCRIPTOR(ts), INTERVAL '10' MINUTES)) "
        "GROUP BY user_id, window_start, window_end"
    )


@register(
    "window_cumulate",
    oracle=f"""
    SELECT ({EPOCH_SQL.format(x='e.ts')} // 3600) * 3600 AS window_start,
           ({EPOCH_SQL.format(x='e.ts')} // 3600) * 3600 + k.len AS window_end,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(x='e.value')} AS sum_value
    FROM events e
    CROSS JOIN (VALUES (900), (1800), (2700), (3600)) AS k(len)
    WHERE EPOCH(e.ts) - (({EPOCH_SQL.format(x='e.ts')} // 3600) * 3600) < k.len
    GROUP BY 1, 2
    """,
    doc="CUMULATE(TABLE events, DESCRIPTOR(ts), step 15 min, size 1 hour) — "
    "Flink's growing windows [H,H+15m),[H,H+30m),…,[H,H+1h). No Spark "
    "native: expand each event into the growing windows that contain it "
    "(map-side explode, ≤4 rows/event) then aggregate — one shuffle, same "
    "asymptotics as Flink's slice-based cumulate state.",
)
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    hour_start = (epoch - epoch % 3600).alias("window_start")
    sec_into_hour = F.col("ts").cast("double") - (epoch - epoch % 3600).cast("double")
    expanded = (
        e.withColumn("window_start", hour_start)
        .withColumn("sec_into_hour", sec_into_hour)
        .withColumn("len", F.explode(F.array(*[F.lit(s) for s in (900, 1800, 2700, 3600)])))
        .filter(F.col("sec_into_hour") < F.col("len"))
        .withColumn("window_end", F.col("window_start") + F.col("len"))
    )
    return expanded.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")
    )


@register(
    "window_tumble_offset_sql",
    oracle=f"""
    SELECT (({EPOCH_SQL.format(x='ts')} - 900) // 3600) * 3600 + 900
               AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(x='value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="TUMBLE with the optional OFFSET argument (Flink 1.19: "
    "TUMBLE(TABLE t, DESCRIPTOR(ts), size, offset) shifts the window "
    "alignment grid — e.g. billing hours starting at :15) through the "
    "SQL front door: the router maps the trailing interval onto Spark "
    "window()'s startTime parameter. Oracle buckets by the same "
    "shifted floor ((epoch - 900) // 3600) * 3600 + 900.",
)
def window_tumble_offset_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__tvfoff_events")
    return StatementRouter(spark).execute(
        "SELECT CAST(window_start AS LONG) AS window_start, event_type, "
        "COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
        "FROM TABLE(TUMBLE(TABLE __tvfoff_events, DESCRIPTOR(ts), "
        "INTERVAL '1' HOUR, INTERVAL '15' MINUTE)) "
        "GROUP BY window_start, event_type"
    )


@register(
    "window_cumulate_offset_sql",
    oracle=f"""
    SELECT (({EPOCH_SQL.format(x='e.ts')} - 300) // 3600) * 3600 + 300
               AS window_start,
           (({EPOCH_SQL.format(x='e.ts')} - 300) // 3600) * 3600 + 300
               + k.len AS window_end,
           COUNT(*) AS n_events
    FROM events e
    CROSS JOIN (VALUES (900), (1800), (2700), (3600)) AS k(len)
    WHERE EPOCH(e.ts) - ((({EPOCH_SQL.format(x='e.ts')} - 300) // 3600)
                         * 3600 + 300) < k.len
      AND EPOCH(e.ts) >= ((({EPOCH_SQL.format(x='e.ts')} - 300) // 3600)
                          * 3600 + 300)
    GROUP BY 1, 2
    """,
    doc="CUMULATE with the optional OFFSET argument through the SQL "
    "front door: the offset shifts the max-window alignment grid "
    "(start = floor((t - off) / max) * max + off) before the growing "
    "window ends expand. Same map-side explode plan as "
    "window_cumulate, grid shifted by 5 minutes.",
)
def window_cumulate_offset_sql(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__tvfoffc_events")
    return StatementRouter(spark).execute(
        "SELECT CAST(window_start AS LONG) AS window_start, "
        "CAST(window_end AS LONG) AS window_end, COUNT(*) AS n_events "
        "FROM TABLE(CUMULATE(TABLE __tvfoffc_events, DESCRIPTOR(ts), "
        "INTERVAL '15' MINUTE, INTERVAL '1' HOUR, INTERVAL '5' MINUTE)) "
        "GROUP BY window_start, window_end"
    )


@register(
    "window_over_time_range",
    oracle=f"""
    SELECT event_id,
           user_id,
           {EPOCH_SQL.format(x='ts')} AS epoch_s,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY {EPOCH_SQL.format(x='ts')}
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_value
    FROM events
    """,
    doc="OVER aggregation with a time RANGE frame (Flink OVER windows, "
    "course-scope lab-time): per-user rolling 1-hour sum. Spark: "
    "Window.partitionBy(user).orderBy(epoch).rangeBetween(-3600, 0). "
    "RANGE frames include all epoch peers, so the result is deterministic "
    "under ties in both engines.",
)
def window_over_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("epoch_s"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("epoch_s", F.col("ts").cast("long"))
        .select(
            "event_id",
            "user_id",
            "epoch_s",
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w)
            .cast("double")
            .alias("rolling_1h_value"),
        )
    )


@register(
    "late_data_filter",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch_s
    FROM events
    WHERE ts >= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
    """,
    doc="Watermark late-data semantics in batch (SURVEY.md §4 item 4): the "
    "final watermark of the S9/S10 zero-delay streams is max(ts); rows "
    "older than watermark - allowed-lateness (1 h here) are the ones "
    "streaming would have dropped. Batch analog: scalar-subquery filter; "
    "the max(ts) aggregate is a tiny broadcast, the filter stays "
    "pushdown-friendly.",
)
def late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("max_ts"))
    return (
        e.join(F.broadcast(wm))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 1 HOUR"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("long").alias("epoch_s"),
        )
    )


@register(
    "window_join",
    oracle=f"""
    WITH clicks AS (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS ws,
               COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), purchases AS (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS ws,
               COUNT(*) AS n_purchases,
               {DSUM_SQL.format(x='value')} AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT c.ws AS window_start, c.n_clicks, p.n_purchases, p.purchase_value
    FROM clicks c
    INNER JOIN purchases p ON c.ws = p.ws
    """,
    doc="Window join (Flink 1.19 WINDOW JOIN TVF — join two windowed "
    "aggregates on identical window boundaries; the lab-joins + lab-time "
    "combination): hourly click counts joined to hourly purchase "
    "counts/value. Both sides share the (window) partitioning, so the "
    "join reuses the aggregation shuffle.",
)
def window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .select(F.col("w.start").cast("long").alias("window_start"), "n_clicks")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value").alias("purchase_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_purchases",
            "purchase_value",
        )
    )
    return clicks.join(purchases, "window_start", "inner")


@register(
    "pattern_funnel",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts,
               event_id
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS view_epoch,
           CAST(FLOOR(EPOCH(next_ts)) AS BIGINT) AS click_epoch,
           event_id AS view_event_id
    FROM seq
    WHERE event_type = 'view' AND next_type = 'click'
      AND next_ts <= ts + INTERVAL 1 HOUR
    """,
    doc="CEP-style pattern detection (Flink MATCH_RECOGNIZE's simplest "
    "shape — adjacent view→click within 1 h per user) expressed with "
    "LEAD over the event sequence: one shuffle on user_id, no state "
    "machine needed for fixed-length adjacent patterns. Longer patterns "
    "compose by chaining LEADs or applyInPandasWithState "
    "(streaming/stateful.py).",
)
def pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return seq.filter(
        (F.col("event_type") == "view")
        & (F.col("next_type") == "click")
        & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    ).select(
        "user_id",
        F.col("ts").cast("long").alias("view_epoch"),
        F.col("next_ts").cast("long").alias("click_epoch"),
        F.col("event_id").alias("view_event_id"),
    )


@register(
    "pattern_funnel3_sequential",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
          JOIN s USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s.s_ts
            AND e.ts <= s.s_ts + INTERVAL 24 HOUR
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
          JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
            AND e.ts <= c.c_ts + INTERVAL 24 HOUR
          GROUP BY e.user_id)
    SELECT s.user_id AS user_id,
           CAST(FLOOR(EPOCH(s.s_ts)) AS BIGINT) AS signup_epoch,
           CAST(FLOOR(EPOCH(c.c_ts)) AS BIGINT) AS click_epoch,
           CAST(FLOOR(EPOCH(p.p_ts)) AS BIGINT) AS purchase_epoch
    FROM s JOIN c USING (user_id) JOIN p USING (user_id)
    """,
    doc="Three-step sequential pattern (MATCH_RECOGNIZE A -> B -> C with "
    "per-step time bounds — the CEP shape beyond pattern_funnel's "
    "adjacent pairs): earliest signup, then earliest click within 24h "
    "AFTER it, then earliest purchase within 24h after THAT. Sequential "
    "min is deterministic (no tie-break needed) and every stage is a "
    "keyed aggregate + equi join on user_id — one shuffle key "
    "throughout, which Catalyst reuses instead of re-exchanging.",
)
def pattern_funnel3_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day_us = 24 * 3600 * 1_000_000

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("ts") > F.col("s_ts"))
            & (F.unix_micros("ts") <= F.unix_micros("s_ts") + day_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"), F.first("s_ts").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.unix_micros("ts") <= F.unix_micros("c_ts") + day_us)
        )
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("p_ts"),
            F.first("s_ts").alias("s_ts"),
            F.first("c_ts").alias("c_ts"),
        )
    )
    return p.select(
        "user_id",
        F.col("s_ts").cast("long").alias("signup_epoch"),
        F.col("c_ts").cast("long").alias("click_epoch"),
        F.col("p_ts").cast("long").alias("purchase_epoch"),
    )


@register(
    "pattern_match_recognize",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts
        FROM events
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS view_epoch,
           CAST(FLOOR(EPOCH(next_ts)) AS BIGINT) AS click_epoch,
           event_id AS view_event_id
    FROM seq
    WHERE event_type = 'view' AND next_type = 'click'
      AND next_ts <= ts + INTERVAL 1 HOUR
    """,
    doc="MATCH_RECOGNIZE through the SQL front door: a lab-style Flink "
    "CEP statement (PATTERN (A B) WITHIN 1h, DEFINE on event_type, "
    "AFTER MATCH SKIP PAST LAST ROW) is accepted verbatim by the "
    "StatementRouter, which lowers the adjacent-sequence subset to the "
    "LEAD-chain plan (plans/match_recognize.py — one shuffle on user_id; "
    "SKIP PAST LAST ROW is exact here because the view/click predicates "
    "are provably disjoint, so matches can never share rows). Unlike "
    "pattern_funnel the pattern input is the UNFILTERED event stream — "
    "adjacency over all events per user, exactly MATCH_RECOGNIZE "
    "semantics.",
)
def pattern_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(view_ts AS LONG) AS view_epoch,
               CAST(click_ts AS LONG) AS click_epoch,
               view_event_id
        FROM __mr_events
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts,
                     B.ts AS click_ts,
                     A.event_id AS view_event_id
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_overlap",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_id,
               value > 20 AS a, value > 110 AS b,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ext AS (
        SELECT *,
               MIN(CASE WHEN NOT a THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nf,
               MAX(CASE WHEN b THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS UNBOUNDED PRECEDING) AS pb,
               MAX(rn) OVER (PARTITION BY user_id) AS maxrn
        FROM base
    ), starts AS (
        SELECT user_id, rn, event_id,
               LEAST(COALESCE(nf, maxrn + 1), maxrn) AS kcap
        FROM ext WHERE a
    ), matches AS (
        SELECT s.user_id, s.rn AS srn, s.event_id AS start_event, c.pb AS k
        FROM starts s JOIN ext c ON c.user_id = s.user_id AND c.rn = s.kcap
        WHERE c.pb IS NOT NULL AND c.pb > s.rn
    )
    SELECT m.user_id, m.start_event, e.event_id AS end_event,
           CAST(m.k - m.srn AS BIGINT) AS n_a
    FROM matches m JOIN ext e ON e.user_id = m.user_id AND e.rn = m.k
    """,
    doc="MATCH_RECOGNIZE with OVERLAPPING DEFINEs — PATTERN (A+ B) where "
    "B (value > 110) implies A (value > 20), so a row can satisfy both "
    "variables and greedy backtracking matters: the first NFA-requiring "
    "CEP shape. Lowered via the per-key Arrow-batched matcher "
    "(plans/match_recognize._lower_plus_overlap): greedy A+ dies at the "
    "first non-A row and backtracks to the LATEST possible B, so each "
    "start's match end is the largest B-row k inside (start, run_end+1] "
    "— one shuffle on user_id (Flink CEP's keyed-state model), "
    "predicates evaluated JVM-side, Python sees booleans only. The "
    "DuckDB oracle re-derives the same closed form with window "
    "functions (next-non-A / latest-B prefix arrays + an rn equi-join).",
)
def pattern_match_recognize_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_ov")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, start_event, end_event, n_a FROM __mr_events_ov
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS start_event,
                     B.event_id AS end_event,
                     COUNT(A.*) AS n_a
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A+ B)
            DEFINE A AS A.value > 20, B AS B.value > 110
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_plus",
    oracle="""
    WITH flags AS (
        SELECT user_id, ts, event_id,
               event_type = 'click' AS a,
               LAG(event_type = 'click') OVER w AS prev_a,
               LEAD(event_type = 'click') OVER w AS next_a,
               LEAD(event_type = 'purchase') OVER w AS next_b,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
        SELECT *, SUM(CASE WHEN a AND NOT COALESCE(prev_a, FALSE)
                           THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
        FROM flags
    ), ends AS (
        SELECT user_id, g,
               MAX(ts) AS last_a_ts,
               BOOL_OR(NOT COALESCE(next_a, FALSE)
                       AND COALESCE(next_b, FALSE)) AS b_ok,
               MAX(CASE WHEN NOT COALESCE(next_a, FALSE)
                        THEN next_ts END) AS b_ts
        FROM isl WHERE a GROUP BY user_id, g
    )
    SELECT i.user_id,
           CAST(FLOOR(EPOCH(e.last_a_ts)) AS BIGINT) AS last_click_epoch,
           CAST(FLOOR(EPOCH(e.b_ts)) AS BIGINT) AS purchase_epoch
    FROM isl i JOIN ends e ON i.user_id = e.user_id AND i.g = e.g
    WHERE i.a AND e.b_ok AND e.b_ts <= i.ts + INTERVAL 2 HOUR
    """,
    doc="MATCH_RECOGNIZE with an UNBOUNDED quantifier — PATTERN "
    "(A+ B): any run of consecutive clicks ending in a purchase, "
    "WITHIN 2h of each start row. Lowered exactly (no NFA) via "
    "gaps-and-islands because the click/purchase DEFINEs are provably "
    "disjoint: greedy backtracking can never succeed where the "
    "maximal-run match fails, so run id = running sum of run starts, "
    "the run END's next-row info is window-broadcast to every run row, "
    "and SKIP TO NEXT ROW emits one match per A-row "
    "(plans/match_recognize._lower_plus — ONE exchange: the run-id "
    "window's clustering is satisfied by the partition-key hash, O(1) "
    "state per row at any run length). A.ts measures the run END (Flink's "
    "last-mapped-row default). The oracle replays the same islands in "
    "DuckDB.",
)
def pattern_match_recognize_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_pl")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(last_click_ts AS LONG) AS last_click_epoch,
               CAST(purchase_ts AS LONG) AS purchase_epoch
        FROM __mr_events_pl
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS last_click_ts,
                     B.ts AS purchase_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A+ B)
            WITHIN INTERVAL '2' HOUR
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "window_topn",
    oracle=f"""
    WITH w AS (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS window_start,
               event_type,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type) AS rnk
        FROM w
    ) WHERE rnk <= 3
    """,
    doc="Flink Window Top-N (the windowing-TVF chapter's flagship "
    "composition): top 3 event types per hour by event count — a "
    "windowed aggregate feeding a per-window rank filter. Spark lowers "
    "the rank filter to WindowGroupLimit over the (already tiny) "
    "aggregate; the windowed aggregate itself is the only data-sized "
    "shuffle. Ties broken by event_type for cross-engine determinism.",
)
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    rk = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(rk).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "event_type", "n_events", "rnk")
    )


@register(
    "window_dedup_first",
    oracle=f"""
    SELECT window_start, user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS first_ts_epoch,
           event_id AS first_event_id
    FROM (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS window_start,
               user_id, ts, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY ({EPOCH_SQL.format(x='ts')} // 3600), user_id
                   ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Flink Window Deduplication: the FIRST event per (hour, user) — "
    "ROW_NUMBER() = 1 over the window/key partition, the per-window "
    "variant of the keyed dedup the compacted-topic lab teaches. One "
    "shuffle on (window, user); Spark's WindowGroupLimit keeps map-side "
    "state at one row per group before the exchange. Tie-broken by "
    "event_id so both engines pick the identical row.",
)
def window_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").start.cast("long").alias("window_start"),
        "user_id",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("window_start", "user_id").orderBy(
        "ts", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "window_start",
            "user_id",
            F.col("ts").cast("long").alias("first_ts_epoch"),
            F.col("event_id").alias("first_event_id"),
        )
    )


@register(
    "pattern_match_recognize_agg",
    oracle="""
    WITH flags AS (
        SELECT user_id, ts, event_id, value,
               event_type = 'click' AS a,
               LAG(event_type = 'click') OVER w AS prev_a,
               LEAD(event_type = 'click') OVER w AS next_a,
               LEAD(event_type = 'purchase') OVER w AS next_b,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
        SELECT *, SUM(CASE WHEN a AND NOT COALESCE(prev_a, FALSE)
                           THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
        FROM flags
    ), runs AS (
        SELECT user_id, g,
               COUNT(*) AS n_clicks,
               MIN(value) AS min_click_value,
               MAX(value) AS max_click_value,
               MAX(CASE WHEN NOT COALESCE(next_a, FALSE)
                        THEN next_ts END) AS b_ts,
               BOOL_OR(NOT COALESCE(next_a, FALSE)
                       AND COALESCE(next_b, FALSE)) AS b_ok
        FROM isl WHERE a GROUP BY user_id, g
    )
    SELECT user_id, n_clicks, min_click_value, max_click_value,
           CAST(FLOOR(EPOCH(b_ts)) AS BIGINT) AS purchase_epoch
    FROM runs WHERE b_ok
    """,
    doc="Aggregate MEASURES over a mapped run — COUNT(A.*) / MIN(A.value) "
    "/ MAX(A.value) on PATTERN (A+ B) under SKIP PAST LAST ROW: per "
    "click-run-ending-in-purchase, how many clicks and their value "
    "range. The lowering precomputes suffix-window aggregates over the "
    "run id partition (same clustering as the end-info window — no "
    "extra exchange, O(1) state per row at any run length); the oracle "
    "replays the per-island GROUP BY in DuckDB. Exact-comparable "
    "aggregates only (COUNT/MIN/MAX) so the hash check is "
    "addition-order-independent; SUM/AVG are unit-tested.",
)
def pattern_match_recognize_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_agg")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, n_clicks, min_click_value, max_click_value,
               CAST(purchase_ts AS LONG) AS purchase_epoch
        FROM __mr_events_agg
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(A.*) AS n_clicks,
                     MIN(A.value) AS min_click_value,
                     MAX(A.value) AS max_click_value,
                     B.ts AS purchase_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_alt",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS view_epoch,
           CASE WHEN next_type = 'click'
                THEN CAST(FLOOR(EPOCH(next_ts)) AS BIGINT) END AS click_epoch,
           CASE WHEN next_type = 'error'
                THEN CAST(FLOOR(EPOCH(next_ts)) AS BIGINT) END AS error_epoch,
           CASE WHEN next_type = 'click' THEN 'B' ELSE 'C' END AS cls
    FROM seq
    WHERE event_type = 'view' AND next_type IN ('click', 'error')
      AND next_ts <= ts + INTERVAL 1 HOUR
    """,
    doc="MATCH_RECOGNIZE with an ALTERNATION group through the SQL front "
    "door: PATTERN (A (B|C)) — a view followed by a click OR an error "
    "WITHIN 1h (the outcome-branching funnel shape). The lowering "
    "expands the group into its variants over ONE shared LEAD chain, "
    "leftmost alternative preferred (Flink's declaration order); the "
    "unchosen variable's measure is NULL and CLASSIFIER() reports which "
    "branch matched. SKIP PAST LAST ROW is exact here (view/click/error "
    "are pairwise-disjoint literals). Single window shuffle on user_id; "
    "the oracle replays the branch CASE in DuckDB.",
)
def pattern_match_recognize_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_alt")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(view_ts AS LONG) AS view_epoch,
               CAST(click_ts AS LONG) AS click_epoch,
               CAST(error_ts AS LONG) AS error_epoch,
               cls
        FROM __mr_events_alt
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts,
                     B.ts AS click_ts,
                     C.ts AS error_ts,
                     CLASSIFIER() AS cls
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A (B|C))
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click',
                   C AS C.event_type = 'error'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_prev",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value, event_type,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts) OVER w AS next_ts,
               LEAD(value) OVER w AS next_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS view_epoch,
           value AS view_value,
           next_value AS click_value
    FROM seq
    WHERE event_type = 'view' AND next_type = 'click'
      AND next_value > value
      AND next_ts <= ts + INTERVAL 1 HOUR
    """,
    doc="MATCH_RECOGNIZE with PREV() row navigation through the SQL "
    "front door: view then click WITHIN 1h where the click's value "
    "EXCEEDS the preceding row's (DEFINE B AS ... AND B.value > "
    "PREV(B.value)) — the rising-pair CEP shape. In the adjacent-"
    "sequence lowering PREV(X.col, n) is a fixed offset (k - n) on the "
    "shared LEAD chain, resolved per variant; reaching before the match "
    "start raises instead of silently comparing the wrong row. Same "
    "single-window-shuffle plan; the oracle replays the offset algebra "
    "in DuckDB.",
)
def pattern_match_recognize_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_pv")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(view_ts AS LONG) AS view_epoch,
               view_value,
               click_value
        FROM __mr_events_pv
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts,
                     A.value AS view_value,
                     B.value AS click_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click'
                          AND B.value > PREV(B.value)
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_all_rows",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts) OVER w AS next_ts,
               LEAD(event_id) OVER w AS next_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT * FROM seq
        WHERE event_type = 'view' AND next_type = 'click'
          AND next_ts <= ts + INTERVAL 1 HOUR
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS row_epoch,
           event_id AS row_event_id,
           'A' AS cls,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS view_epoch,
           CAST(NULL AS BIGINT) AS click_epoch
    FROM m
    UNION ALL
    SELECT user_id,
           CAST(FLOOR(EPOCH(next_ts)) AS BIGINT),
           next_id,
           'B',
           CAST(FLOOR(EPOCH(ts)) AS BIGINT),
           CAST(FLOOR(EPOCH(next_ts)) AS BIGINT)
    FROM m
    """,
    doc="MATCH_RECOGNIZE with ALL ROWS PER MATCH through the SQL front "
    "door: the same view→click WITHIN-1h pattern as "
    "pattern_match_recognize, but emitting EVERY matched input row with "
    "RUNNING measure semantics (click_epoch is NULL on the A row — the "
    "variable is not yet matched) and CLASSIFIER() naming each row's "
    "variable. Lowered as the LEAD-chain match plus an offset explode "
    "picking each row's columns from the shared structs — still one "
    "shuffle on user_id. The oracle replays the per-offset rows as a "
    "two-branch UNION ALL in DuckDB.",
)
def pattern_match_recognize_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_ar")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(ts AS LONG) AS row_epoch,
               event_id AS row_event_id,
               cls,
               CAST(view_ts AS LONG) AS view_epoch,
               CAST(click_ts AS LONG) AS click_epoch
        FROM __mr_events_ar
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts,
                     B.ts AS click_ts,
                     CLASSIFIER() AS cls
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_unmatched",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               LEAD(event_type) OVER w AS nt,
               LEAD(ts) OVER w AS nts,
               LEAD(event_id) OVER w AS nid,
               LAG(event_type) OVER w AS pt,
               LAG(ts) OVER w AS pts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT * FROM seq
        WHERE event_type = 'view' AND nt = 'click'
          AND nts <= ts + INTERVAL 1 HOUR
    )
    SELECT user_id, event_id AS row_event_id, 'A' AS cls,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS view_epoch
    FROM m
    UNION ALL
    SELECT user_id, nid, 'B', CAST(FLOOR(EPOCH(ts)) AS BIGINT)
    FROM m
    UNION ALL
    SELECT user_id, event_id, CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT)
    FROM seq
    WHERE NOT COALESCE(event_type = 'view' AND nt = 'click'
               AND nts <= ts + INTERVAL 1 HOUR, FALSE)
      AND NOT COALESCE(event_type = 'click' AND pt = 'view'
               AND ts <= pts + INTERVAL 1 HOUR, FALSE)
    """,
    doc="ALL ROWS PER MATCH WITH UNMATCHED ROWS: every event comes back "
    "— rows of a view→click match with their running measures and "
    "CLASSIFIER(), every other row once with NULLs (the audit-trail "
    "reading of CEP output). Coverage is computed with L-1 LAGs of the "
    "matched-variant index over the SAME window partitioning (no extra "
    "exchange) — a row is unmatched iff no match starts at it or at the "
    "L-1 rows before it. The oracle replays matched rows as the "
    "two-branch UNION ALL plus the complementary unmatched scan.",
)
def pattern_match_recognize_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_um")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               event_id AS row_event_id,
               cls,
               CAST(view_ts AS LONG) AS view_epoch
        FROM __mr_events_um
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts,
                     CLASSIFIER() AS cls
            ALL ROWS PER MATCH WITH UNMATCHED ROWS
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_quant",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(ts, 1) OVER w AS s1,
               LEAD(event_id, 1) OVER w AS i1,
               LEAD(event_type, 2) OVER w AS t2,
               LEAD(ts, 2) OVER w AS s2,
               LEAD(event_id, 2) OVER w AS i2,
               LEAD(event_type, 3) OVER w AS t3,
               LEAD(ts, 3) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT *,
               CASE
                 WHEN event_type = 'click' AND t1 = 'click' AND t2 = 'click'
                      AND t3 = 'purchase' AND s3 <= ts + INTERVAL 2 HOUR
                 THEN 4
                 WHEN event_type = 'click' AND t1 = 'click'
                      AND t2 = 'purchase' AND s2 <= ts + INTERVAL 2 HOUR
                 THEN 3
                 WHEN event_type = 'click'
                      AND t1 = 'purchase' AND s1 <= ts + INTERVAL 2 HOUR
                 THEN 2
               END AS mlen
        FROM seq
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(CASE mlen WHEN 4 THEN s2 WHEN 3 THEN s1
                            ELSE ts END)) AS BIGINT) AS last_click_epoch,
           CASE mlen WHEN 4 THEN i2 WHEN 3 THEN i1
                ELSE event_id END AS last_click_id,
           CAST(FLOOR(EPOCH(CASE mlen WHEN 4 THEN s3 WHEN 3 THEN s2
                            ELSE s1 END)) AS BIGINT) AS purchase_epoch
    FROM m WHERE mlen IS NOT NULL
    """,
    doc="MATCH_RECOGNIZE with a BOUNDED quantifier through the SQL front "
    "door: PATTERN (A{1,3} B) — one-to-three adjacent clicks then a "
    "purchase, WITHIN 2 hours, AFTER MATCH SKIP TO NEXT ROW. The "
    "lowering (plans/match_recognize.py) expands the quantifier into "
    "its three fixed-length variants over ONE shared LEAD chain and "
    "picks the longest match per start row via a descending when-chain "
    "— greedy Flink-default semantics, including backtracking to a "
    "shorter variant when only that one meets the WITHIN bound. "
    "Measures on the quantified variable bind to its LAST mapped row "
    "(Flink default). Still a single window pass / one shuffle on "
    "user_id; the oracle replays the identical variant CASE in DuckDB.",
)
def pattern_match_recognize_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_q")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(last_click_ts AS LONG) AS last_click_epoch,
               last_click_id,
               CAST(purchase_ts AS LONG) AS purchase_epoch
        FROM __mr_events_q
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS last_click_ts,
                     A.event_id AS last_click_id,
                     B.ts AS purchase_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A{1,3} B)
            WITHIN INTERVAL '2' HOUR
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "window_distinct_users",
    oracle=f"""
    SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS window_start,
           event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc="COUNT(DISTINCT) inside tumbling windows — the windowed-distinct "
    "pattern (unique visitors per hour) that motivates HLL at scale "
    "(agg_hll_mergeable_sketch is the approximate drop-in). Catalyst "
    "expands the distinct into a two-stage aggregate keyed by (window, "
    "type, user): both shuffles carry pre-deduplicated keys.",
)
def window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_users",
            "n_events",
        )
    )


@register(
    "pattern_match_recognize_opt",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               LAG(event_type) OVER w AS p1,
               LAG(ts) OVER w AS ps1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CASE WHEN p1 = 'view'
                THEN {EPOCH_SQL.format(x='ps1')} END AS view_epoch,
           {EPOCH_SQL.format(x='ts')} AS purchase_epoch,
           CAST(CASE WHEN p1 = 'view' THEN 1 ELSE 0 END AS BIGINT) AS n_view
    FROM seq WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id, CAST(NULL AS BIGINT), {EPOCH_SQL.format(x='ts')},
           CAST(0 AS BIGINT)
    FROM seq WHERE event_type = 'purchase' AND p1 = 'view'
    """,
    doc="MATCH_RECOGNIZE with an OPTIONAL variable: PATTERN (A? B) — an "
    "optionally view-preceded purchase, AFTER MATCH SKIP TO NEXT ROW. "
    "A? sugars to A{0,1}: the lowering unions the [A B] and [B] "
    "LEAD-chain variants (greedy prefers the longer), so every purchase "
    "row emits the zero-length-A match and a view-then-purchase start "
    "additionally emits the mapped-A match with its measures bound "
    "(plans/match_recognize.py per-position cross product). Still ONE "
    "window pass / one shuffle on user_id. The oracle replays both "
    "variants with a LAG in DuckDB: purchases emit once (plus once "
    "more, with the A measures NULL, when the preceding row is a view "
    "— that start row's own zero-A match).",
)
def pattern_match_recognize_opt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_opt")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(view_ts AS LONG) AS view_epoch,
               CAST(purchase_ts AS LONG) AS purchase_epoch,
               n_view
        FROM __mr_events_opt
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts, B.ts AS purchase_ts,
                     COUNT(A.*) AS n_view
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A? B)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_multi_alt",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               LEAD(event_type) OVER w AS t1,
               LEAD(ts) OVER w AS s1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CASE WHEN event_type = 'view'
                THEN {EPOCH_SQL.format(x='ts')} END AS view_epoch,
           CASE WHEN event_type = 'click'
                THEN {EPOCH_SQL.format(x='ts')} END AS click_epoch,
           {EPOCH_SQL.format(x='s1')} AS outcome_epoch,
           CASE WHEN t1 = 'purchase' THEN 'B' ELSE 'C' END AS cls
    FROM seq
    WHERE event_type IN ('view', 'click')
      AND t1 IN ('purchase', 'error')
    """,
    doc="MATCH_RECOGNIZE with MULTIPLE alternation groups: PATTERN "
    "((A|D) (B|C)) — a view or click immediately followed by a purchase "
    "or error, AFTER MATCH SKIP TO NEXT ROW. The lowering cross-"
    "multiplies the groups into four LEAD-chain variants (leftmost "
    "alternative preferred per position); the unchosen variable's "
    "measures are NULL and CLASSIFIER() names the matched end variable. "
    "ONE window pass / one shuffle on user_id; the oracle replays the "
    "IN-list equivalent in DuckDB.",
)
def pattern_match_recognize_multi_alt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_malt")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(view_ts AS LONG) AS view_epoch,
               CAST(click_ts AS LONG) AS click_epoch,
               CAST(COALESCE(purchase_ts, error_ts) AS LONG)
                   AS outcome_epoch,
               cls
        FROM __mr_events_malt
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS view_ts, D.ts AS click_ts,
                     B.ts AS purchase_ts, C.ts AS error_ts,
                     CLASSIFIER() AS cls
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN ((A|D) (B|C))
            DEFINE A AS A.event_type = 'view',
                   D AS D.event_type = 'click',
                   B AS B.event_type = 'purchase',
                   C AS C.event_type = 'error'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_star",
    oracle=f"""
    WITH flags AS (
        SELECT user_id, ts, event_id, event_type,
               event_type = 'click' AS a,
               LAG(event_type = 'click') OVER w AS prev_a,
               LEAD(event_type = 'click') OVER w AS next_a,
               LEAD(event_type = 'signup') OVER w AS next_b,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
        SELECT *, SUM(CASE WHEN a AND NOT COALESCE(prev_a, FALSE)
                           THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
        FROM flags
    ), ends AS (
        SELECT user_id, g,
               BOOL_OR(NOT COALESCE(next_a, FALSE)
                       AND COALESCE(next_b, FALSE)) AS b_ok,
               MAX(CASE WHEN NOT COALESCE(next_a, FALSE)
                        THEN next_ts END) AS b_ts
        FROM isl WHERE a GROUP BY user_id, g
    )
    SELECT i.user_id,
           {EPOCH_SQL.format(x='i.ts')} AS first_click_epoch,
           {EPOCH_SQL.format(x='e.b_ts')} AS signup_epoch
    FROM isl i JOIN ends e ON i.user_id = e.user_id AND i.g = e.g
    WHERE i.a AND e.b_ok
    UNION ALL
    SELECT user_id, CAST(NULL AS BIGINT), {EPOCH_SQL.format(x='ts')}
    FROM events WHERE event_type = 'signup'
    """,
    doc="MATCH_RECOGNIZE with a ZERO-OR-MORE run: PATTERN (A* B) — any "
    "(possibly empty) run of consecutive clicks ending in a signup, "
    "AFTER MATCH SKIP TO NEXT ROW. Zero-min runs route to the per-key "
    "Arrow-batched greedy matcher (plans/match_recognize."
    "_lower_plus_overlap): each click of a qualifying run starts a "
    "match (FIRST(A) = itself), and EVERY signup row additionally "
    "emits the empty-run match with NULL A-measures — the A* "
    "backtracking fallback. Predicates are evaluated JVM-side before "
    "the single shuffle on user_id; Python state is one group pass. "
    "The oracle replays the click-run islands plus the bare signups in "
    "DuckDB.",
)
def pattern_match_recognize_star(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_star")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(first_click_ts AS LONG) AS first_click_epoch,
               CAST(signup_ts AS LONG) AS signup_epoch
        FROM __mr_events_star
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.ts) AS first_click_ts,
                     B.ts AS signup_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A* B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'signup'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_all_rows_quant",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(ts, 1) OVER w AS s1,
               LEAD(event_type, 2) OVER w AS t2,
               LEAD(ts, 2) OVER w AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT *,
               CASE
                 WHEN event_type = 'click' AND t1 = 'click'
                      AND t2 = 'purchase' THEN 3
                 WHEN event_type = 'click' AND t1 = 'purchase' THEN 2
               END AS mlen
        FROM seq
    ), x AS (
        SELECT m.*, k FROM m
        CROSS JOIN UNNEST(generate_series(0, 2)) AS u(k)
        WHERE mlen IS NOT NULL AND k < mlen
    )
    SELECT user_id,
           {EPOCH_SQL.format(x="CASE k WHEN 0 THEN ts WHEN 1 THEN s1 ELSE s2 END")}
               AS row_epoch,
           CASE WHEN k = mlen - 1 THEN 'B' ELSE 'A' END AS cls
    FROM x
    """,
    doc="ALL ROWS PER MATCH with a QUANTIFIED pattern: PATTERN (A{1,2} "
    "B) — one or two clicks then a purchase, every matched input row "
    "emitted, AFTER MATCH SKIP TO NEXT ROW. Each match explodes to its "
    "OWN variant's length (the greedy 3-row variant where it applies, "
    "else 2), looked up from a literal length array by the matched "
    "variant index; CLASSIFIER() names each row's variable. One window "
    "pass + a rows-per-match explode — no second exchange. The oracle "
    "replays the greedy CASE and a bounded UNNEST in DuckDB.",
)
def pattern_match_recognize_all_rows_quant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_arq")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, CAST(ts AS LONG) AS row_epoch, cls
        FROM __mr_events_arq
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES CLASSIFIER() AS cls
            ALL ROWS PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A{1,2} B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "window_topn_sql",
    oracle=f"""
    WITH w AS (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS window_start,
               event_type,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type) AS rnk
        FROM w
    ) WHERE rnk <= 3
    """,
    doc="Flink's Window Top-N through the SQL FRONT DOOR: the canonical "
    "nested statement — ROW_NUMBER over a TUMBLE TVF aggregate, WHERE "
    "rnk <= 3 — accepted verbatim by the StatementRouter. The TVF "
    "rewrite turns the inner table into a window()-derived table and "
    "Catalyst plans the rank filter as WindowGroupLimit over the "
    "already-aggregated rows; same oracle as window_topn. The identical "
    "statement also runs CONTINUOUSLY through Engine.sql_stream "
    "(chained-aggregation rewrite, append on window close — "
    "tests/test_streaming_parity.py).",
)
def window_topn_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__topn_sql_events")
    return StatementRouter(spark).execute(
        """
        SELECT CAST(window_start AS LONG) AS window_start, event_type,
               n_events, CAST(rnk AS LONG) AS rnk
        FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY window_start, window_end
              ORDER BY n_events DESC, event_type) AS rnk
          FROM (
            SELECT window_start, window_end, event_type,
                   COUNT(*) AS n_events
            FROM TABLE(TUMBLE(TABLE __topn_sql_events, DESCRIPTOR(ts),
                              INTERVAL '1' HOUR))
            GROUP BY window_start, window_end, event_type
          )
        ) WHERE rnk <= 3
        """
    )


@register(
    "window_dedup_sql",
    oracle=f"""
    SELECT window_start, user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS first_ts_epoch,
           event_id AS first_event_id
    FROM (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS window_start,
               user_id, ts, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY ({EPOCH_SQL.format(x='ts')} // 3600), user_id
                   ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Flink's Window Deduplication through the SQL FRONT DOOR: "
    "ROW_NUMBER ORDER BY ts over the raw TUMBLE TVF rows, WHERE rn = 1 "
    "— accepted verbatim by the StatementRouter, planned as "
    "WindowGroupLimit (one row of map-side state per (window, user) "
    "before the exchange); same oracle as window_dedup_first. The "
    "identical statement also runs CONTINUOUSLY through "
    "Engine.sql_stream (single windowed min_by, append on window "
    "close).",
)
def window_dedup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__dedup_sql_events")
    return StatementRouter(spark).execute(
        """
        SELECT CAST(window_start AS LONG) AS window_start, user_id,
               CAST(ts AS LONG) AS first_ts_epoch,
               event_id AS first_event_id
        FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY window_start, window_end, user_id
              ORDER BY ts, event_id) AS rn
          FROM TABLE(TUMBLE(TABLE __dedup_sql_events, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR))
        ) WHERE rn = 1
        """
    )


@register(
    "window_join_sql",
    oracle=f"""
    WITH clicks AS (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS ws,
               COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), purchases AS (
        SELECT ({EPOCH_SQL.format(x='ts')} // 3600) * 3600 AS ws,
               COUNT(*) AS n_purchases,
               {DSUM_SQL.format(x='value')} AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT c.ws AS window_start, c.n_clicks, p.n_purchases, p.purchase_value
    FROM clicks c
    INNER JOIN purchases p ON c.ws = p.ws
    """,
    doc="Flink's WINDOW JOIN through the SQL FRONT DOOR (rounding out "
    "the TVF statement surface beside TUMBLE/HOP/SESSION/CUMULATE "
    "aggregates, Window Top-N, and Window Dedup): two windowed "
    "aggregates — each a TUMBLE TVF derived table — joined on "
    "identical (window_start, window_end) boundaries, accepted "
    "verbatim by the StatementRouter. Same oracle as the DataFrame "
    "window_join. Both sides aggregate on the join key, so the join "
    "reuses the aggregation partitioning with no extra shuffle.",
)
def window_join_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__wjoin_sql_events")
    return StatementRouter(spark).execute(
        """
        SELECT CAST(L.window_start AS LONG) AS window_start, L.n_clicks,
               R.n_purchases, R.purchase_value
        FROM (
          SELECT window_start, window_end, COUNT(*) AS n_clicks
          FROM TABLE(TUMBLE(TABLE __wjoin_sql_events, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR))
          WHERE event_type = 'click'
          GROUP BY window_start, window_end
        ) L INNER JOIN (
          SELECT window_start, window_end, COUNT(*) AS n_purchases,
                 CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                     AS purchase_value
          FROM TABLE(TUMBLE(TABLE __wjoin_sql_events, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR))
          WHERE event_type = 'purchase'
          GROUP BY window_start, window_end
        ) R ON L.window_start = R.window_start
           AND L.window_end = R.window_end
        """
    )


@register(
    "pattern_match_recognize_crossvar",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_type, value,
               LAG(event_type) OVER w AS p_type,
               LAG(value) OVER w AS p_value,
               LAG(ts) OVER w AS p_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           {EPOCH_SQL.format(x='p_ts')} AS click_epoch,
           p_value AS click_value,
           {EPOCH_SQL.format(x='ts')} AS purchase_epoch,
           value AS purchase_value
    FROM seq
    WHERE event_type = 'purchase' AND p_type = 'click'
      AND value > p_value
    """,
    doc="MATCH_RECOGNIZE with a CROSS-VARIABLE DEFINE — the classic CEP "
    "shape (Flink docs' price-increase pattern): PATTERN (A B), B "
    "defined as a purchase whose value EXCEEDS the preceding click's "
    "(B.value > A.value). The lowering resolves the other variable's "
    "reference to its last already-matched row per variant "
    "(plans/match_recognize._pred_at_offset with variant context); "
    "still one window pass / one shuffle on user_id. The oracle "
    "replays the LAG comparison in DuckDB.",
)
def pattern_match_recognize_crossvar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_xv")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(click_ts AS LONG) AS click_epoch,
               click_value,
               CAST(purchase_ts AS LONG) AS purchase_epoch,
               purchase_value
        FROM __mr_events_xv
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS click_ts, A.value AS click_value,
                     B.ts AS purchase_ts, B.value AS purchase_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase' AND B.value > A.value
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_mod_define",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type, value,
               LEAD(event_id) OVER w AS n_id,
               LEAD(value) OVER w AS n_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           event_id AS a_event, value AS a_value,
           n_id AS b_event, n_value AS b_value
    FROM seq
    WHERE event_type = 'view' AND n_id IS NOT NULL
      AND mod(n_value - 60, 7) > mod(value - 60, 7)
    """,
    doc="MATCH_RECOGNIZE with SQL MOD (%) inside a cross-variable "
    "DEFINE on frequently-NEGATIVE dividends — pins the dividend-sign "
    "remainder contract across ALL legs (ADVICE r12): the LEAD-chain "
    "lowering evaluates % in Spark SQL (Java semantics, fmod), the "
    "generator-NFA route compiles it to the _sqlmod helper "
    "(plans/match_recognize._SqlModRewriter), and the DuckDB oracle "
    "replays mod() (DuckDB's %%/mod are dividend-sign; its fmod is "
    "FLOORED — the opposite naming of C). value < 60 makes the "
    "dividend negative, where "
    "Python's divisor-sign %% would flip comparisons and change the "
    "match set — a hash mismatch here means the legs diverged.",
)
def pattern_match_recognize_mod_define(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_mod")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, a_event, a_value, b_event, b_value
        FROM __mr_events_mod
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS a_event, A.value AS a_value,
                     B.event_id AS b_event, B.value AS b_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'view',
                   B AS (B.value - 60) % 7 > (A.value - 60) % 7
        ) AS m
        """
    )


def _vshape_oracle() -> str:
    """DuckDB replay of PATTERN (S D{1,3} U{1,3}) greedy matching: LEAD
    chains of down/up flags, variants tested in Flink preference order
    (earlier position dominates: d descending, then u descending)."""
    def cond(d: int, u: int) -> str:
        downs = " AND ".join(f"dn{j}" for j in range(1, d + 1))
        ups = " AND ".join(f"up{j}" for j in range(d + 1, d + u + 1))
        return f"({downs} AND {ups})"

    variants = [(d, u) for d in (3, 2, 1) for u in (3, 2, 1)]
    mlen = "CASE\n" + "\n".join(
        f"  WHEN {cond(d, u)} THEN {d * 10 + u}" for d, u in variants
    ) + "\n END"
    bottom = "CASE mv " + " ".join(
        f"WHEN {d * 10 + u} THEN v{d}" for d, u in variants
    ) + " END"
    end = "CASE mv " + " ".join(
        f"WHEN {d * 10 + u} THEN v{d + u}" for d, u in variants
    ) + " END"
    leads = ",\n".join(
        [f"    LEAD(value, {j}) OVER w AS v{j}" for j in range(1, 7)]
    )
    flags = ",\n".join(
        [
            f"    LEAD(value, {j}) OVER w < "
            f"{'value' if j == 1 else f'LEAD(value, {j - 1}) OVER w'} AS dn{j}"
            for j in range(1, 4)
        ]
        + [
            f"    LEAD(value, {j}) OVER w > LEAD(value, {j - 1}) OVER w "
            f"AS up{j}"
            for j in range(2, 7)
        ]
    )
    return f"""
    WITH seq AS (
        SELECT user_id, ts, value,
{leads},
{flags}
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT *, {mlen} AS mv FROM seq
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS start_epoch,
           value AS start_value,
           {bottom} AS bottom_value,
           {end} AS end_value,
           CAST(mv // 10 AS BIGINT) AS n_down,
           CAST(mv % 10 AS BIGINT) AS n_up
    FROM m WHERE mv IS NOT NULL
    """


@register(
    "pattern_match_recognize_vshape",
    oracle=_vshape_oracle(),
    doc="The Flink documentation's flagship CEP example — the V-shape "
    "(price dip) pattern — bounded: PATTERN (S D{1,3} U{1,3}), D "
    "defined by PREV navigation (value < PREV(value)), U rising, S any "
    "row (implicit TRUE), AFTER MATCH SKIP TO NEXT ROW. Exercises TWO "
    "quantifiers in one pattern (9 cross-product variants, greedy "
    "d-then-u preference), PREV inside quantified DEFINEs, and FIRST/"
    "LAST measures across them — all over ONE shared LEAD chain / one "
    "shuffle on user_id. The oracle replays the greedy variant CASE "
    "with down/up LEAD flags in DuckDB.",
)
def pattern_match_recognize_vshape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_vs")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(start_ts AS LONG) AS start_epoch,
               start_value, bottom_value, end_value, n_down, n_up
        FROM __mr_events_vs
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES S.ts AS start_ts, S.value AS start_value,
                     D.value AS bottom_value, U.value AS end_value,
                     COUNT(D.*) AS n_down, COUNT(U.*) AS n_up
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (S D{1,3} U{1,3})
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > PREV(U.value)
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_nav",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, value,
               LEAD(value, 1) OVER w AS v1,
               LEAD(value, 2) OVER w AS v2,
               LEAD(value, 3) OVER w AS v3,
               LEAD(ts, 3) OVER w AS s3,
               LEAD(ts, 2) OVER w AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), m AS (
        SELECT *,
               CASE
                 WHEN v1 < value AND v2 < v1 AND v3 > v1 THEN 2
                 WHEN v1 < value AND v2 > v1 THEN 1
               END AS n_down
        FROM seq
    )
    SELECT user_id,
           {EPOCH_SQL.format(x='ts')} AS start_epoch,
           value AS start_value,
           CAST(n_down AS BIGINT) AS n_down,
           CASE n_down WHEN 2 THEN v3 ELSE v2 END AS recovery_value,
           {EPOCH_SQL.format(x='CASE n_down WHEN 2 THEN s3 ELSE s2 END')}
               AS recovery_epoch
    FROM m WHERE n_down IS NOT NULL
    """,
    doc="FIRST() navigation INSIDE DEFINE: PATTERN (S D{1,2} U) where "
    "the recovery row must exceed the FIRST down row's value "
    "(U.value > FIRST(D.value)) — the dip-recovery condition PREV alone "
    "cannot express. The lowering resolves FIRST/LAST over the "
    "variant's mapped-so-far offsets (plans/match_recognize FIRST/LAST "
    "resolution); one LEAD chain, one shuffle. The oracle replays the "
    "greedy two-variant CASE in DuckDB (FIRST(D) is the first down "
    "row = v1 in both variants).",
)
def pattern_match_recognize_nav(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_nav")
    return StatementRouter(spark).execute(
        """
        SELECT user_id,
               CAST(start_ts AS LONG) AS start_epoch,
               start_value, n_down, recovery_value,
               CAST(recovery_ts AS LONG) AS recovery_epoch
        FROM __mr_events_nav
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES S.ts AS start_ts, S.value AS start_value,
                     COUNT(D.*) AS n_down,
                     U.value AS recovery_value, U.ts AS recovery_ts
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (S D{1,2} U)
            DEFINE D AS D.value < PREV(D.value),
                   U AS U.value > FIRST(D.value)
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_skip_past",
    oracle="""
    WITH RECURSIVE leads AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS rn,
               event_type = 'click' AS a0,
               COALESCE(LEAD(event_type, 1) OVER w = 'click', FALSE) AS a1,
               COALESCE(LEAD(event_type, 2) OVER w = 'click', FALSE) AS a2,
               COALESCE(LEAD(event_type, 1) OVER w = 'purchase', FALSE) AS b1,
               COALESCE(LEAD(event_type, 2) OVER w = 'purchase', FALSE) AS b2,
               COALESCE(LEAD(event_type, 3) OVER w = 'purchase', FALSE) AS b3,
               LEAD(event_id, 1) OVER w AS e1,
               LEAD(event_id, 2) OVER w AS e2,
               LEAD(event_id, 3) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), cand AS (
        SELECT user_id, rn, first_click, mlen,
               CASE mlen WHEN 4 THEN e3 WHEN 3 THEN e2 ELSE e1 END
                   AS purchase_event,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS idx
        FROM (
            SELECT user_id, rn, event_id AS first_click, e1, e2, e3,
                   CASE WHEN a0 AND a1 AND a2 AND b3 THEN 4
                        WHEN a0 AND a1 AND b2 THEN 3
                        WHEN a0 AND b1 THEN 2 END AS mlen
            FROM leads
        ) WHERE mlen IS NOT NULL
    ), walk AS (
        SELECT user_id, idx, rn, first_click, mlen, purchase_event,
               TRUE AS kept, rn + mlen - 1 AS last_end
        FROM cand WHERE idx = 1
        UNION ALL
        SELECT c.user_id, c.idx, c.rn, c.first_click, c.mlen,
               c.purchase_event,
               c.rn > w.last_end AS kept,
               CASE WHEN c.rn > w.last_end THEN c.rn + c.mlen - 1
                    ELSE w.last_end END AS last_end
        FROM walk w JOIN cand c
          ON c.user_id = w.user_id AND c.idx = w.idx + 1
    )
    SELECT user_id, first_click,
           CAST(mlen - 1 AS BIGINT) AS n_clicks, purchase_event
    FROM walk WHERE kept
    """,
    doc="AFTER MATCH SKIP PAST LAST ROW with a QUANTIFIED variable — "
    "PATTERN (A{1,3} B): greedy candidates from different starts can "
    "overlap (a match may start inside another's click run), so the "
    "LEAD-chain lowering keeps every start's greedy match and a per-key "
    "sequential pass over the scalar candidate tuples keeps the "
    "leftmost non-overlapping chain — the NFA's skip-past walk "
    "(plans/match_recognize._skip_past_selection: candidates only, "
    "full-width rows never leave the JVM; semi join back on the window "
    "position). The oracle computes the same greedy candidates with "
    "LEADs and replays the sequential selection as a recursive CTE.",
)
def pattern_match_recognize_skip_past(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_sp")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, first_click, n_clicks, purchase_event
        FROM __mr_events_sp
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS first_click,
                     COUNT(A.*) AS n_clicks,
                     B.event_id AS purchase_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A{1,3} B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_all_rows_plus",
    oracle="""
    WITH RECURSIVE ord AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER w AS rn,
               COALESCE(value > 20, FALSE) AS a,
               COALESCE(value > 110, FALSE) AS b
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), nf AS (
        SELECT *,
               MIN(CASE WHEN NOT a THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nfail
        FROM ord
    ), cand AS (
        SELECT user_id, s, e,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s) AS idx
        FROM (
            SELECT o.user_id, o.rn AS s,
                   (SELECT MAX(b2.rn) FROM ord b2
                    WHERE b2.user_id = o.user_id AND b2.b
                      AND b2.rn > o.rn
                      AND (o.nfail IS NULL OR b2.rn <= o.nfail)) AS e
            FROM nf o WHERE o.a
        ) WHERE e IS NOT NULL
    ), walk AS (
        SELECT user_id, idx, s, e, TRUE AS kept, e AS last_end
        FROM cand WHERE idx = 1
        UNION ALL
        SELECT c.user_id, c.idx, c.s, c.e,
               c.s > w.last_end AS kept,
               CASE WHEN c.s > w.last_end THEN c.e ELSE w.last_end END
                 AS last_end
        FROM walk w JOIN cand c
          ON c.user_id = w.user_id AND c.idx = w.idx + 1
    ), sel AS (
        SELECT user_id, s, e,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s) AS mn
        FROM walk WHERE kept
    )
    SELECT r.user_id, r.event_id, r.value,
           CASE WHEN r.rn = m.e THEN 'B' ELSE 'A' END AS cls,
           CAST(m.mn AS BIGINT) AS mn,
           CAST(CASE WHEN r.rn = m.e THEN m.e - m.s
                     ELSE r.rn - m.s + 1 END AS BIGINT) AS n_a,
           CASE WHEN r.rn = m.e THEN r.value END AS b_value
    FROM ord r JOIN sel m
      ON r.user_id = m.user_id AND r.rn BETWEEN m.s AND m.e
    """,
    doc="ALL ROWS PER MATCH over an UNBOUNDED OVERLAPPING run — "
    "PATTERN (A+ B), B (value>110) a subset of A (value>20), SKIP PAST "
    "LAST ROW: every matched input row is emitted with RUNNING "
    "measures (CLASSIFIER names the row's variable, COUNT(A.*) counts "
    "A-rows so far, B.value is NULL until the closing row) — the "
    "per-key Arrow-batched matcher's ALL ROWS leg "
    "(plans/match_recognize._lower_plus_overlap). The oracle re-derives "
    "greedy ends with window prefix arrays, replays the skip-past walk "
    "as a recursive CTE, and explodes matches with a range join.",
)
def pattern_match_recognize_all_rows_plus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_arp")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, event_id, value, cls, mn, n_a, b_value
        FROM __mr_events_arp
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mn,
                     COUNT(A.*) AS n_a, B.value AS b_value
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS A.value > 20, B AS B.value > 110
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_prev_run",
    oracle="""
    WITH RECURSIVE ord AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER w AS rn,
               COALESCE(value < LAG(value, 1) OVER w, FALSE) AS a,
               COALESCE(value > LAG(value, 1) OVER w, FALSE) AS b
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), nf AS (
        SELECT *,
               MIN(CASE WHEN NOT a THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nfail
        FROM ord
    ), cand AS (
        SELECT user_id, s, e,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s) AS idx
        FROM (
            SELECT o.user_id, o.rn AS s,
                   (SELECT MAX(b2.rn) FROM ord b2
                    WHERE b2.user_id = o.user_id AND b2.b
                      AND b2.rn > o.rn
                      AND (o.nfail IS NULL OR b2.rn <= o.nfail)) AS e
            FROM nf o WHERE o.a
        ) WHERE e IS NOT NULL
    ), walk AS (
        SELECT user_id, idx, s, e, TRUE AS kept, e AS last_end
        FROM cand WHERE idx = 1
        UNION ALL
        SELECT c.user_id, c.idx, c.s, c.e,
               c.s > w.last_end AS kept,
               CASE WHEN c.s > w.last_end THEN c.e ELSE w.last_end END
                 AS last_end
        FROM walk w JOIN cand c
          ON c.user_id = w.user_id AND c.idx = w.idx + 1
    )
    SELECT s.user_id,
           fr.event_id AS first_down,
           CAST(s.e - s.s AS BIGINT) AS n_down,
           er.event_id AS recovery_event,
           er.value AS recovery_value
    FROM (SELECT user_id, s, e FROM walk WHERE kept) s
    JOIN ord fr ON fr.user_id = s.user_id AND fr.rn = s.s
    JOIN ord er ON er.user_id = s.user_id AND er.rn = s.e
    """,
    doc="PREV() inside an UNBOUNDED run — PATTERN (A+ B), A AS value < "
    "PREV(value) (strictly falling run), B AS value > PREV(value) "
    "(recovery tick), AFTER MATCH SKIP PAST LAST ROW: the Flink docs' "
    "falling-price CEP shape at unbounded length. PREV navigates "
    "PHYSICAL partition rows, so it lowers as a window lag computed "
    "JVM-side before the per-key greedy matcher's booleans "
    "(plans/match_recognize._rewrite_prev_to_lag) — exact at any run "
    "length, one shuffle on user_id. The oracle re-derives the greedy "
    "ends with LAG + prefix windows and replays the skip-past walk as "
    "a recursive CTE.",
)
def pattern_match_recognize_prev_run(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_pr")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, first_down, n_down, recovery_event, recovery_value
        FROM __mr_events_pr
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS first_down,
                     COUNT(A.*) AS n_down,
                     B.event_id AS recovery_event,
                     B.value AS recovery_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS A.value < PREV(A.value),
                   B AS B.value > PREV(B.value)
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_next",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, value,
               LEAD(value, 1) OVER w AS v1,
               LEAD(event_id, 1) OVER w AS e1,
               LEAD(value, 2) OVER w AS v2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS a_event, e1 AS b_event, v1 AS b_value
    FROM seq
    WHERE value > 100 AND v1 IS NOT NULL AND v2 < v1
    """,
    doc="NEXT() navigation inside DEFINE — PATTERN (A B), B AS "
    "NEXT(B.value) < B.value: the closing row must be followed by a "
    "PHYSICAL drop (the row after the match). NEXT(B.value) at pattern "
    "offset 1 reaches physical offset 2, one past the 2-row LEAD "
    "chain, so it lowers as a scalar lead helper column anchored at "
    "the match start (plans/match_recognize._pred_at_offset phys_ref) "
    "— same window, no extra exchange. Out-of-partition navigation is "
    "NULL, making the predicate false (Flink semantics). The oracle "
    "states the same condition with LEADs.",
)
def pattern_match_recognize_next(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_nx")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, a_event, b_event, b_value FROM __mr_events_nx
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS a_event, B.event_id AS b_event,
                     B.value AS b_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B)
            DEFINE A AS A.value > 100,
                   B AS NEXT(B.value) < B.value
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_mid_plus",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), nc AS (
        SELECT user_id, rn,
               MIN(CASE WHEN event_type <> 'click' THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nf
        FROM ord
    )
    SELECT v.user_id, v.event_id AS view_event,
           CAST(n.nf - (v.rn + 1) AS BIGINT) AS n_clicks,
           p.event_id AS purchase_event
    FROM ord v
    JOIN nc n ON n.user_id = v.user_id AND n.rn = v.rn + 1
    JOIN ord p ON p.user_id = v.user_id AND p.rn = n.nf
    WHERE v.event_type = 'view'
      AND n.nf > v.rn + 1
      AND p.event_type = 'purchase'
    """,
    doc="UNBOUNDED quantifier at a MIDDLE position — PATTERN "
    "(A B+ C): a view, one-or-more clicks, then a purchase; the "
    "three-variable funnel the two-variable run lowerings cannot "
    "express. Lowered by the general per-key NFA matcher "
    "(plans/match_recognize._lower_nfa): per-variable booleans are "
    "computed JVM-side before the single shuffle on user_id, the "
    "Arrow-batched DFS applies greedy SQL preference (longest click "
    "run first) with a failure memo. Disjoint predicates make greedy "
    "exact-maximal, so the oracle can state the match in closed form: "
    "first non-click row after the view bounds the run, and must be a "
    "purchase.",
)
def pattern_match_recognize_mid_plus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_mp")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, view_event, n_clicks, purchase_event
        FROM __mr_events_mp
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS view_event,
                     COUNT(B.*) AS n_clicks,
                     C.event_id AS purchase_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B+ C)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click',
                   C AS C.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_rich_crossvar",
    oracle=f"""
    WITH RECURSIVE ord AS (
        SELECT user_id, event_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), ext AS (
        SELECT a.user_id, a.rn AS s, a.value AS a_val, a.ts AS a_ts,
               1 AS k
        FROM ord a JOIN ord r
          ON r.user_id = a.user_id AND r.rn = a.rn + 1
        WHERE a.event_type = 'view' AND r.value > a.value * 0.5 + 1
        UNION ALL
        SELECT e.user_id, e.s, e.a_val, e.a_ts, e.k + 1
        FROM ext e JOIN ord r
          ON r.user_id = e.user_id AND r.rn = e.s + e.k + 1
        WHERE r.value > e.a_val * 0.5 + 1
    ), cand AS (
        SELECT e.user_id, e.s, e.a_ts, e.a_val, e.k,
               b.value AS last_b, c.ts AS c_ts, c.value AS c_val
        FROM ext e
        JOIN ord b ON b.user_id = e.user_id AND b.rn = e.s + e.k
        JOIN ord c ON c.user_id = e.user_id AND c.rn = e.s + e.k + 1
        WHERE c.event_type = 'purchase'
          AND c.value < (e.a_val + b.value) / 2
    ), best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, s
                                     ORDER BY k DESC) AS pref
        FROM cand
    )
    SELECT user_id,
           {EPOCH_SQL.format(x='a_ts')} AS a_epoch,
           a_val AS a_value,
           CAST(k AS BIGINT) AS n_b,
           last_b AS last_b_value,
           {EPOCH_SQL.format(x='c_ts')} AS c_epoch,
           c_val AS c_value
    FROM best WHERE pref = 1
    """,
    doc="RICH cross-variable DEFINEs inside an NFA-routed pattern "
    "(VERDICT r11 Next #6 — closes the last DEFINE gap): PATTERN "
    "(A B+ C) with B AS B.value > FIRST(A.value) * 0.5 + 1 "
    "(arithmetic over a foreign partial-match reference) and C AS "
    "C.value < (A.value + LAST(B.value)) / 2 (an expression combining "
    "TWO foreign references) — neither fits the simple-comparison "
    "fast path, and the unbounded B+ keeps the pattern outside the "
    "bounded LEAD lowering that previously had exclusive rich-DEFINE "
    "support. plans/match_recognize.compile_rich_cross compiles each "
    "part once into a restricted expression (refs + literals + "
    "arithmetic only, NULL/unmatched-ref = FALSE) that the generator "
    "backtracker evaluates against the partial match's bindings at "
    "every candidate row; greedy preference still takes the LONGEST "
    "B-run whose following C passes. The DuckDB oracle replays the "
    "semantics with a recursive CTE (consecutive B-run extension per "
    "start, then the longest run whose successor row satisfies C). "
    "Streaming keeps its loud documented cap for rich parts (the "
    "engine's cross-variable subset streams; richer forms route to "
    "this batch plan). 100 TB: one shuffle on user_id, per-key "
    "Arrow-batched matching, no driver state.",
)
def pattern_match_recognize_rich_crossvar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_rxv")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, CAST(a_ts AS LONG) AS a_epoch, a_value, n_b,
               last_b_value, CAST(c_ts AS LONG) AS c_epoch, c_value
        FROM __mr_events_rxv
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS a_ts, A.value AS a_value,
                     COUNT(B.*) AS n_b, LAST(B.value) AS last_b_value,
                     C.ts AS c_ts, C.value AS c_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B+ C)
            DEFINE A AS A.event_type = 'view',
                   B AS B.value > FIRST(A.value) * 0.5 + 1,
                   C AS C.event_type = 'purchase'
                        AND C.value < (A.value + LAST(B.value)) / 2
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_agg_define",
    oracle=f"""
    WITH RECURSIVE ord AS (
        SELECT user_id, event_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), ext AS (
        SELECT a.user_id, a.rn AS s, a.ts AS a_ts, 1 AS k,
               r.value AS sum_b
        FROM ord a JOIN ord r
          ON r.user_id = a.user_id AND r.rn = a.rn + 1
        WHERE a.event_type = 'view' AND r.event_type <> 'purchase'
        UNION ALL
        SELECT e.user_id, e.s, e.a_ts, e.k + 1, e.sum_b + r.value
        FROM ext e JOIN ord r
          ON r.user_id = e.user_id AND r.rn = e.s + e.k + 1
        WHERE r.event_type <> 'purchase'
    )
    SELECT e.user_id,
           {EPOCH_SQL.format(x='e.a_ts')} AS a_epoch,
           CAST(e.k AS BIGINT) AS n_b,
           c.value AS c_value
    FROM ext e JOIN ord c
      ON c.user_id = e.user_id AND c.rn = e.s + e.k + 1
    WHERE c.event_type = 'purchase' AND c.value * e.k < e.sum_b
    """,
    doc="AGGREGATES INSIDE DEFINE (round 12, Flink/SQL:2016 parity — "
    "closes a README Known limit): PATTERN (A B+ C) with C AS "
    "C.event_type = 'purchase' AND C.value * COUNT(B.*) < SUM(B.value) "
    "— the closing row must be cheaper than the running AVERAGE of the "
    "buffered run, the canonical price-drop CEP idiom. "
    "compile_rich_cross parses COUNT/SUM/AVG/MIN/MAX(X.col|X.*) as "
    "'AGG' refs the matchers evaluate over the partial match's mapped "
    "rows (NULL-skipping, empty aggregate = SQL NULL = FALSE; the "
    "defining variable's rows include the current candidate — running "
    "semantics). Patterns whose fast paths cannot evaluate aggregates "
    "re-route structurally: A+ B becomes an unbounded run, PERMUTE its "
    "matched-set node, bounded LEAD chains their generator AST. The "
    "engine folds SUM left-to-right in mapped-row order, so the "
    "recursive-CTE oracle's carried sum replays the exact IEEE add "
    "sequence and the driver hash covers the double, not just the "
    "verdict for the predicate; the SUM measure itself stays out of "
    "the hashed columns (the measure machinery sums pairwise — 1-ULP "
    "drift vs any SQL fold, the same reason LN/ROUND stay out of "
    "oracle pairs; tests pin it separately). Streams on the "
    "decision-window legs via the same "
    "compiled refs. 100 TB: one shuffle on user_id, per-key matching.",
)
def pattern_match_recognize_agg_define(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_aggd")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, CAST(a_ts AS LONG) AS a_epoch, n_b, c_value
        FROM __mr_events_aggd
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS a_ts, COUNT(B.*) AS n_b,
                     C.value AS c_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B+ C)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type <> 'purchase',
                   C AS C.event_type = 'purchase'
                        AND C.value * COUNT(B.*) < SUM(B.value)
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_group_quant",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER w AS rn,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS cum_b,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), nc AS (
        SELECT user_id, rn,
               MIN(CASE WHEN event_type NOT IN ('click', 'error')
                        THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nf
        FROM ord
    )
    SELECT v.user_id, v.event_id AS view_event,
           CAST(e.cum_b - v.cum_b AS BIGINT) AS n_click,
           CAST(e.cum_c - v.cum_c AS BIGINT) AS n_error,
           p.event_id AS purchase_event
    FROM ord v
    JOIN nc n ON n.user_id = v.user_id AND n.rn = v.rn + 1
    JOIN ord p ON p.user_id = v.user_id AND p.rn = n.nf
    JOIN ord e ON e.user_id = v.user_id AND e.rn = n.nf - 1
    WHERE v.event_type = 'view'
      AND n.nf > v.rn + 1
      AND p.event_type = 'purchase'
    """,
    doc="QUANTIFIED alternation group — PATTERN (A (B|C)+ D): a view, "
    "one-or-more rows each either click or error (leftmost-preferred "
    "assignment), then a purchase. Each repetition of the group matches "
    "ANY alternative, which no fixed-length variant expansion can "
    "express — the per-key NFA matcher's unified position model "
    "(plans/match_recognize._lower_nfa pos_spec: (alternatives, lo, "
    "hi, lazy) nodes) runs the greedy any-alternative run with "
    "per-row leftmost assignment. Disjoint predicates make greedy "
    "exact-maximal, so the oracle states the run in closed form with "
    "prefix sums for the per-variable counts.",
)
def pattern_match_recognize_group_quant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_gq")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, view_event, n_click, n_error, purchase_event
        FROM __mr_events_gq
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS view_event,
                     COUNT(B.*) AS n_click,
                     COUNT(C.*) AS n_error,
                     D.event_id AS purchase_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A (B|C)+ D)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click',
                   C AS C.event_type = 'error',
                   D AS D.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_permute",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, event_type,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2,
               LEAD(event_id, 1) OVER w AS e1,
               LEAD(event_id, 2) OVER w AS e2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CASE 'view' WHEN event_type THEN event_id
                       WHEN t1 THEN e1 ELSE e2 END AS view_event,
           CASE 'click' WHEN event_type THEN event_id
                        WHEN t1 THEN e1 ELSE e2 END AS click_event,
           CASE 'purchase' WHEN event_type THEN event_id
                           WHEN t1 THEN e1 ELSE e2 END AS purchase_event
    FROM ord
    WHERE list_sort([event_type, t1, t2])
          = ['click', 'purchase', 'view']
    """,
    doc="PERMUTE (A, B, C) — view, click, purchase in ANY order over "
    "three consecutive rows: the SQL:2016 permutation pattern, expanded "
    "to the 3! fixed-length variants in lexicographic preference order "
    "over one shared LEAD chain (plans/match_recognize — same plan "
    "shape as a plain 3-step sequence, one window exchange). Disjoint "
    "predicates mean exactly one permutation can bind each window, so "
    "the oracle checks the sorted type triple and assigns by type.",
)
def pattern_match_recognize_permute(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_pm")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, view_event, click_event, purchase_event
        FROM __mr_events_pm
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS view_event,
                     B.event_id AS click_event,
                     C.event_id AS purchase_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (PERMUTE (A, B, C))
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click',
                   C AS C.event_type = 'purchase'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_skip_to",
    oracle="""
    WITH RECURSIVE leads AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS rn,
               COALESCE(value > 50, FALSE) AS a0,
               COALESCE(LEAD(value, 1) OVER w > 100, FALSE) AS b1,
               COALESCE(LEAD(value, 2) OVER w > 100, FALSE) AS b2,
               LEAD(event_id, 1) OVER w AS e1,
               LEAD(event_id, 2) OVER w AS e2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), cand AS (
        SELECT user_id, rn, event_id AS a_event,
               CASE WHEN b2 THEN 2 ELSE 1 END AS delta,
               CASE WHEN b2 THEN e2 ELSE e1 END AS last_b,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn)
                   AS idx
        FROM leads WHERE a0 AND b1
    ), walk AS (
        SELECT user_id, idx, rn, a_event, delta, last_b,
               TRUE AS kept, rn + delta AS cur
        FROM cand WHERE idx = 1
        UNION ALL
        SELECT c.user_id, c.idx, c.rn, c.a_event, c.delta, c.last_b,
               c.rn >= w.cur AS kept,
               CASE WHEN c.rn >= w.cur THEN c.rn + c.delta
                    ELSE w.cur END AS cur
        FROM walk w JOIN cand c
          ON c.user_id = w.user_id AND c.idx = w.idx + 1
    )
    SELECT user_id, a_event, CAST(delta AS BIGINT) AS n_b, last_b
    FROM walk WHERE kept
    """,
    doc="AFTER MATCH SKIP TO LAST B — PATTERN (A B{1,2}) with B "
    "(value>100) a SUBSET of A (value>50): matching resumes AT the "
    "last B row, which itself satisfies A and may START the next match "
    "— the overlapping-by-design resume mode SKIP PAST LAST ROW "
    "cannot express. The candidate-selection walk carries a "
    "per-variant resume delta (offset of the skip target row) instead "
    "of the match length (plans/match_recognize._skip_past_selection); "
    "a delta of zero raises Flink's would-loop error. The oracle "
    "replays the same walk as a recursive CTE with inclusive "
    "admission (rn >= cur).",
)
def pattern_match_recognize_skip_to(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_st")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, a_event, n_b, last_b FROM __mr_events_st
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS a_event,
                     COUNT(B.*) AS n_b,
                     B.event_id AS last_b
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO LAST B
            PATTERN (A B{1,2})
            DEFINE A AS A.value > 50,
                   B AS B.value > 100
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_nested",
    oracle="""
    WITH RECURSIVE ord AS (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER w AS rn,
               LEAD(event_type, 1) OVER w AS t1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), pairs AS (
        SELECT user_id, rn,
               (event_type = 'click' AND t1 = 'purchase') AS ok
        FROM ord
    ), chain AS (
        SELECT p.user_id, p.rn, 1 AS len
        FROM pairs p
        WHERE p.ok AND NOT EXISTS (
            SELECT 1 FROM pairs q
            WHERE q.user_id = p.user_id AND q.rn = p.rn + 2 AND q.ok
        )
        UNION ALL
        SELECT p.user_id, p.rn, c.len + 1
        FROM pairs p JOIN chain c
          ON c.user_id = p.user_id AND c.rn = p.rn + 2
        WHERE p.ok
    )
    SELECT v.user_id, v.event_id AS view_event,
           CAST(c.len AS BIGINT) AS n_pairs,
           d.event_id AS error_event
    FROM ord v
    JOIN chain c ON c.user_id = v.user_id AND c.rn = v.rn + 1
    JOIN ord d ON d.user_id = v.user_id AND d.rn = v.rn + 1 + 2 * c.len
    WHERE v.event_type = 'view' AND d.event_type = 'error'
    """,
    doc="NESTED pattern group — PATTERN (A (B C)+ D): a view, one or "
    "more (click purchase) PAIRS, then an error. The repeated "
    "subsequence is a nested group no per-position model can express; "
    "the recursive-descent pattern AST "
    "(plans/match_recognize._parse_pattern_ast) compiles it for the "
    "per-key NFA's generator backtracker (greedy repetition, "
    "left-first alternation, zero-width guards). Disjoint predicates "
    "make the greedy chain exact-maximal, so the oracle computes pair-"
    "chain lengths with a stride-2 recursive CTE.",
)
def pattern_match_recognize_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_ns")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, view_event, n_pairs, error_event
        FROM __mr_events_ns
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS view_event,
                     COUNT(B.*) AS n_pairs,
                     D.event_id AS error_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A (B C)+ D)
            DEFINE A AS A.event_type = 'view',
                   B AS B.event_type = 'click',
                   C AS C.event_type = 'purchase',
                   D AS D.event_type = 'error'
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_crossvar_run",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER w AS rn,
               COALESCE(value < 50, FALSE) AS a,
               COALESCE(value > LAG(value, 1) OVER w, FALSE) AS b
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), nf AS (
        SELECT *,
               MIN(CASE WHEN NOT a THEN rn END) OVER
                 (PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nfail
        FROM ord
    )
    SELECT o.user_id, o.event_id AS first_low,
           CAST(e.rn - o.rn AS BIGINT) AS run_len,
           e.event_id AS spike_event, e.value AS spike_value
    FROM nf o
    JOIN ord e
      ON e.user_id = o.user_id
     AND e.rn = (SELECT MAX(b2.rn) FROM ord b2
                 WHERE b2.user_id = o.user_id AND b2.b
                   AND b2.rn > o.rn
                   AND (o.nfail IS NULL OR b2.rn <= o.nfail))
    WHERE o.a
    """,
    doc="Cross-variable comparison inside an UNBOUNDED run — PATTERN "
    "(A+ B), A AS value < 50, B AS B.value > A.value (the closing row "
    "must exceed the run's LAST mapped row): the Flink-docs "
    "spike-after-dip shape the closed-form run lowerings cannot carry "
    "(B's predicate depends on the partial match). The parse re-routes "
    "the two-variable shape to the general NFA, where the simple "
    "cross comparison evaluates against the bindings "
    "(plans/match_recognize cross_checks; memo disabled — matching is "
    "context-sensitive). B.value > A.value with A = last run row "
    "equals value > LAG(value), so the oracle re-derives greedy ends "
    "with the same prefix-window closed form.",
)
def pattern_match_recognize_crossvar_run(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_xr")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, first_low, run_len, spike_event, spike_value
        FROM __mr_events_xr
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS first_low,
                     COUNT(A.*) AS run_len,
                     B.event_id AS spike_event,
                     B.value AS spike_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A+ B)
            DEFINE A AS A.value < 50,
                   B AS B.value > A.value
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_self_nav",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER w AS rn,
               COALESCE(value >= 90, FALSE) AS fa,
               COALESCE(value < 90, FALSE) AS fb
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), starts AS (
        SELECT s.user_id, s.rn, s.event_id AS start_event,
               f.value AS vfirst
        FROM ord s
        JOIN ord f ON f.user_id = s.user_id AND f.rn = s.rn + 1
        WHERE s.fa AND f.fb
    ), ends AS (
        SELECT st.user_id, st.rn, st.start_event,
               COALESCE(
                   (SELECT MIN(x.rn) FROM ord x
                    WHERE x.user_id = st.user_id AND x.rn > st.rn
                      AND NOT (x.fb AND x.value >= st.vfirst)) - 1,
                   (SELECT MAX(x2.rn) FROM ord x2
                    WHERE x2.user_id = st.user_id)
               ) AS end_rn
        FROM starts st
    )
    SELECT e.user_id, e.start_event,
           CAST(e.end_rn - e.rn AS BIGINT) AS n_run,
           le.event_id AS last_b_event
    FROM ends e
    JOIN ord le ON le.user_id = e.user_id AND le.rn = e.end_rn
    """,
    doc="SELF-navigating FIRST/LAST match binding inside a DEFINE over "
    "an UNBOUNDED run — PATTERN (A B+), B AS B.value < 90 AND B.value "
    ">= FIRST(B.value): every later run row must stay at or above the "
    "run's FIRST mapped row (Flink semantics — the defining variable's "
    "mapped-so-far rows INCLUDE the current candidate, so the first B "
    "compares against itself, trivially true). Round 8: previously "
    "'lowered only for bounded patterns'; now the simple-comparison "
    "form rides the general NFA's cross-check mechanism (and STREAMS "
    "through the break-decided/time-bounded window legs — "
    "test_self_nav_defines_stream). With nothing after B+ the greedy "
    "run is the maximal prefix, so the oracle derives each per-start "
    "(SKIP TO NEXT ROW) end as the first row failing the "
    "anchored-to-first predicate. 100 TB: one exchange on user_id; "
    "per-key state = the partial match only.",
)
def pattern_match_recognize_self_nav(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_sn")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, start_event, n_run, last_b_event
        FROM __mr_events_sn
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.event_id AS start_event,
                     COUNT(B.*) AS n_run,
                     LAST(B.event_id) AS last_b_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B+)
            DEFINE A AS A.value >= 90,
                   B AS B.value < 90 AND B.value >= FIRST(B.value)
        ) AS m
        """
    )


@register(
    "over_agg_sql",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_sum,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW
           ) AS rolling_n
    FROM events
    """,
    doc="Flink's Over Aggregation through the SQL FRONT DOOR: the "
    "canonical statement — agg OVER (PARTITION BY ... ORDER BY rowtime "
    "RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW) — accepted "
    "verbatim by the StatementRouter (Catalyst plans the interval RANGE "
    "frame natively; one window exchange, running-frame aggregation). "
    "The sum routes through DECIMAL(38,6) (dsum convention) so the "
    "frame sum is order-exact. The same statement shape also runs "
    "CONTINUOUSLY through Engine.sql_stream (keyed frame-buffer state, "
    "one emitted row per input row — streaming/over_agg.py, "
    "parity-tested). 100 TB: one shuffle on the partition key; the "
    "frame aggregation is a sequential pass per key — the identical "
    "cost Flink's OverWindow operator pays.",
)
def over_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__over_agg_events")
    return StatementRouter(spark).execute(
        """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1' HOUR PRECEDING
                         AND CURRENT ROW
               ) AS DOUBLE) AS rolling_sum,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '1' HOUR PRECEDING
                         AND CURRENT ROW
               ) AS rolling_n
        FROM __over_agg_events
        """
    )


@register(
    "pattern_match_recognize_measure_nav",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER w AS rn,
               COALESCE(value < 90, FALSE) AS fa,
               COALESCE(value >= 90, FALSE) AS fb
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
        SELECT user_id, rn,
               rn - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY rn) AS grp
        FROM ord WHERE fa
    ), runs AS (
        SELECT user_id, grp, MIN(rn) AS srn, MAX(rn) AS ern,
               COUNT(*) AS n_run
        FROM isl GROUP BY user_id, grp
    )
    SELECT r.user_id,
           f0.value AS f0, f1.value AS f1,
           l1.value AS l1, l3.value AS l3,
           CAST(r.n_run AS BIGINT) AS n_run,
           b.event_id AS end_event
    FROM runs r
    JOIN ord b  ON b.user_id = r.user_id AND b.rn = r.ern + 1 AND b.fb
    JOIN ord f0 ON f0.user_id = r.user_id AND f0.rn = r.srn
    LEFT JOIN ord f1 ON f1.user_id = r.user_id
                    AND f1.rn = r.srn + 1 AND f1.rn <= r.ern
    LEFT JOIN ord l1 ON l1.user_id = r.user_id
                    AND l1.rn = r.ern - 1 AND l1.rn >= r.srn
    LEFT JOIN ord l3 ON l3.user_id = r.user_id
                    AND l3.rn = r.ern - 3 AND l3.rn >= r.srn
    """,
    doc="FIRST/LAST logical-offset arguments in MEASURES (SQL:2016; "
    "Flink 1.19 MATCH_RECOGNIZE measure navigation — the round-8 "
    "README residual, closed in round 9): over each user's maximal "
    "value<90 run followed by a value>=90 row, FIRST(A.value, 1) is "
    "the second mapped row, LAST(A.value, 1)/LAST(A.value, 3) step "
    "back from the run end, and an offset past the mapped count is "
    "NULL. Lowered by the gaps-and-islands A+ B plan (one window "
    "pass; the offsets ride extra LAG/LEAD columns on the SAME "
    "exchange — no join, no NFA). Oracle: islands + per-offset "
    "self-joins on the row-number frame. The same offsets stream "
    "(tests/test_streaming_parity.py::test_stream_measure_nav_*). "
    "100 TB: one shuffle on user_id, O(1) state per row.",
)
def pattern_match_recognize_measure_nav(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_mn")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, f0, f1, l1, l3, n_run, end_event
        FROM __mr_events_mn
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.value) AS f0,
                     FIRST(A.value, 1) AS f1,
                     LAST(A.value, 1) AS l1,
                     LAST(A.value, 3) AS l3,
                     COUNT(A.*) AS n_run,
                     B.event_id AS end_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS A.value < 90,
                   B AS B.value >= 90
        ) AS m
        """
    )


@register(
    "pattern_match_recognize_permute5",
    oracle="""
    WITH ord AS (
        SELECT user_id, event_id, event_type,
               [event_type, LEAD(event_type, 1) OVER w,
                LEAD(event_type, 2) OVER w, LEAD(event_type, 3) OVER w,
                LEAD(event_type, 4) OVER w] AS types,
               [event_id, LEAD(event_id, 1) OVER w,
                LEAD(event_id, 2) OVER w, LEAD(event_id, 3) OVER w,
                LEAD(event_id, 4) OVER w] AS ids
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           ids[list_position(types, 'view')] AS view_event,
           ids[list_position(types, 'click')] AS click_event,
           ids[list_position(types, 'purchase')] AS purchase_event,
           ids[list_position(types, 'signup')] AS signup_event,
           ids[list_position(types, 'error')] AS error_event
    FROM ord
    WHERE list_sort(types)
          = ['click', 'error', 'purchase', 'signup', 'view']
    """,
    doc="PERMUTE over FIVE variables — all five event types in ANY "
    "order across five consecutive rows ('the user who did everything, "
    "in whatever order'). 5! = 120 orderings exceed the LEAD-chain "
    "when-chain budget, so this lowers through the alternation AST + "
    "generator NFA (round 10 — the cap was 4 variables before), which "
    "walks alternatives lazily in declaration order, i.e. SQL:2016's "
    "lexicographic preference exactly. Disjoint one-type-per-variable "
    "predicates mean exactly one ordering can bind each window, so the "
    "oracle checks the sorted type quintuple and assigns ids by type. "
    "SKIP TO NEXT ROW keeps every candidate start (SQL-expressible "
    "overlap semantics). One window exchange + per-key linear NFA scan.",
)
def pattern_match_recognize_permute5(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..plans.router import StatementRouter

    t(spark, sf_dir, "events").createOrReplaceTempView("__mr_events_pm5")
    return StatementRouter(spark).execute(
        """
        SELECT user_id, view_event, click_event, purchase_event,
               signup_event, error_event
        FROM __mr_events_pm5
        MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES V.event_id AS view_event,
                     C.event_id AS click_event,
                     P.event_id AS purchase_event,
                     S.event_id AS signup_event,
                     E.event_id AS error_event
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (PERMUTE (C, E, P, S, V))
            DEFINE V AS V.event_type = 'view',
                   C AS C.event_type = 'click',
                   P AS P.event_type = 'purchase',
                   S AS S.event_type = 'signup',
                   E AS E.event_type = 'error'
        ) AS m
        """
    )
