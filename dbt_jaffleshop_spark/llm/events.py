"""Event-stream batch operators over the `events` table: sessionization
and JSON property extraction (beyond-reference extensions; the reference
has no streaming/event surface — SURVEY §2.11).

Sessionization is the classic gap-based algorithm: lag() per user, flag
gaps > 30 min, running sum of flags = session index, then aggregate per
session. Both windows shuffle once on user_id (explicit ROWS frames; all
arithmetic integer microseconds/cents, so parity is exact). At 100 TB
this partitions by user — no global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def events_sessionize(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("ts_us"),
        F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(order).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(order) > SESSION_GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn(
        "session_idx", F.sum("new_session").over(running)
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum("value_cents").alias("session_value_cents"),
        F.countDistinct("event_type").alias("n_event_types"),
    )


def events_json_stats(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """JSON extraction (`props` is a JSON string column) + per-type rollup.
    get_json_object is a JVM-side expression — no Python in the path."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr("cast(get_json_object(props, '$.k') as bigint)").alias("k"),
        F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        (F.sum("k").cast("double") / F.count("k").cast("double")).alias("avg_k"),
        F.sum("value_cents").alias("sum_value_cents"),
    )


def events_asof_join(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """As-of join (a relational operator Spark SQL lacks natively):
    attach to every 'purchase' event the most recent prior-or-same-time
    'click' by the same user.

    Implementation: the union-and-fill composition — tag both sides, union,
    and carry the latest click forward with last_value(ignoreNulls) over a
    (user_id, time) window; then keep only purchase rows. ONE shuffle on
    user_id, no range-explosion — at 100 TB this beats an inequality join
    (which Spark would execute as a broadcast-nested-loop or a range-bucket
    blowup). Clicks are pre-deduplicated to (user, ts) grain (max event_id)
    so tie behavior is deterministic and matches DuckDB's native ASOF JOIN,
    which the oracle uses as an independent implementation."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type",
        F.expr("unix_micros(ts)").alias("ts_us"),
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("event_id"))
        .select("event_id", "user_id", "ts_us", F.lit(0).alias("kind"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", F.lit(1).alias("kind")
    )
    tagged = clicks.unionByName(purchases)
    # clicks sort before a same-timestamp purchase (kind 0 < 1) → '<=' asof
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumns(
        {
            "click_event_id": F.last(
                F.when(F.col("kind") == 0, F.col("event_id")), ignorenulls=True
            ).over(w),
            "click_ts_us": F.last(
                F.when(F.col("kind") == 0, F.col("ts_us")), ignorenulls=True
            ).over(w),
        }
    )
    return filled.where(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "click_event_id",
        "click_ts_us",
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    )


FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day stage-to-stage window


def events_funnel(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest view → the earliest
    click within 7 days after it → the earliest purchase within 7 days
    after that, plus the stage reached. The classic product-analytics
    operator (and a training-data signal: which sessions convert).

    Implementation: three chained conditional-min WINDOW aggregates over
    the SAME user_id partitioning — stage N's anchor is stage N-1's
    window result, which plain groupBy aggregation cannot express in one
    pass. Catalyst plans all three Window operators after a single
    exchange on user_id: one shuffle total, no self-joins, no
    driver-side anything — the shape that survives 100 TB of events."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "view_ts_us",
            F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "click_ts_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") >= F.col("view_ts_us"))
                    & (F.col("ts_us") <= F.col("view_ts_us") + FUNNEL_WINDOW_US),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("click_ts_us"))
                    & (F.col("ts_us") <= F.col("click_ts_us") + FUNNEL_WINDOW_US),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("view_ts_us").alias("view_ts_us"),
        F.min("click_ts_us").alias("click_ts_us"),
        F.min("purchase_ts_us").alias("purchase_ts_us"),
    )
    return per_user.select(
        "user_id",
        "view_ts_us",
        "click_ts_us",
        "purchase_ts_us",
        F.expr(
            "case when purchase_ts_us is not null then 3"
            " when click_ts_us is not null then 2"
            " when view_ts_us is not null then 1 else 0 end"
        ).alias("reached_stage"),
        F.col("purchase_ts_us").isNotNull().alias("converted"),
    )


STICKY_WINDOW_DAYS = 7  # DAU/WAU trailing window


def events_stickiness(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Product-analytics stickiness: per activity day, DAU, trailing
    7-day WAU, and the DAU/WAU ratio — the standard engagement metric
    (a distinct-count over a SLIDING window, which is not
    partial-aggregatable and so needs a different shape from ordinary
    windowed aggs).

    Plan shape for 100 TB: the heavy step is ONE distinct on (day,
    user_id) — everything after runs on the deduped relation, whose size
    is bounded by days × active users. The sliding-window distinct is an
    exact ×7 explode (each activity day emits the window days it serves)
    followed by two partial-aggregated groupBys — NO join at all for the
    window, in particular not the non-equi range join a naive
    formulation plans as a nested-loop; the only join left is the tiny
    equi-join assembling dau with wau per day. No per-user window, no
    global window, no re-scan of raw events. stickiness_milli is the
    integer-exact compare column; the double ratio divides the same
    integers last. (The final inner join keeps exactly the activity
    days: every activity day's own window contains it, so no dau row is
    ever dropped.)"""
    ev = load_table(spark, "events", sf_dir)
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    win = du.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {STICKY_WINDOW_DAYS - 1}))")
        ).alias("day"),
        "user_id",
    ).distinct()
    wau = win.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.expr("dau * 1000 div wau").alias("stickiness_milli"),
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


TRANSITION_TOPK = 3


def events_transition_topk(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """First-order Markov transition mining over per-user event
    sequences (r5): for each observed (prev_event_type → event_type)
    transition, its count, the total transitions leaving prev_event_type,
    the integer-bp transition probability, and the per-source top-3 by
    count (ties broken on the target type — deterministic). The
    sequence-model building block behind next-event prediction and
    behavioral-cohort features.

    Plan shape for 100 TB: ONE shuffle on user_id for the lag window
    (same partitioning the sessionizer uses), then aggregation onto the
    |event_types|² relation — everything after the first groupBy runs on
    a dimension-cardinality table, so the per-source total and rank
    windows are trivially safe (W2 contract: post-aggregation input)."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "event_id",
    )
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(order))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    per_source = Window.partitionBy("prev_type")
    ranked = pairs.withColumn(
        "from_total", F.sum("n_transitions").over(per_source)
    ).withColumn(
        "rank",
        F.row_number().over(
            per_source.orderBy(
                F.col("n_transitions").desc(), F.col("event_type").asc()
            )
        ),
    )
    return ranked.where(F.col("rank") <= TRANSITION_TOPK).select(
        "prev_type",
        "event_type",
        "n_transitions",
        "from_total",
        F.expr("n_transitions * 10000 div from_total").alias("rate_bp"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def events_retention_cohorts(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Weekly cohort retention (r6) — the canonical product-analytics
    matrix: users are cohorted by the Monday-start week of their FIRST
    event; for every (cohort_week, weeks-since-cohort offset) cell,
    the distinct users active that week, the cohort's size, and the
    integer-bp retention rate. Offset 0 is the cohort week itself
    (retention_bp = 10000 by construction — kept as the self-check
    column product dashboards rely on).

    Plan shape for 100 TB: first-event per user is ONE partial-
    aggregated groupBy on user_id; the cohort label joins back to
    events on the SAME user_id key (co-partitioned shuffle); the
    (cohort, offset, user) distinct partial-aggregates before its
    shuffle, and the final matrix is |weeks|² rows — dimension-sized.
    No windows at all. date_trunc('week') is Monday-start in BOTH
    engines and the offset is an integer day-diff div 7, so parity is
    exact."""
    # NULL user_ids are excluded explicitly: they cannot be cohorted
    # (no identity to retain), and leaving them in would let Spark's
    # groupBy NULL group and DuckDB's NULL-skipping count(DISTINCT)
    # silently disagree on cohort_size
    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
    )
    cohorts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        ev.join(cohorts, "user_id")
        .select(
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7").alias("offset_weeks"),
            "user_id",
        )
        .distinct()
        # count(*) is exact here: the explicit distinct above already
        # deduplicated (cohort, offset, user) — a countDistinct would
        # pay a second dedup aggregation over the same corpus-sized data
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    # cohorts is one-row-per-user by construction (groupBy user_id)
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "offset_weeks",
            "cohort_size",
            "retained",
            F.expr("retained * 10000 div cohort_size").alias("retention_bp"),
        )
    )


ANOMALY_WINDOW_DAYS = 7
ANOMALY_Z = 2  # flag days where z² > Z² against the trailing window


def events_daily_anomalies(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Trailing-window volume anomaly flags (r6) — the ops-monitoring
    staple: per (event_type, day) counts, compared against the mean and
    variance of the 7 PRIOR CALENDAR days; a day is anomalous when its
    z-score exceeds 2. The day axis is DENSIFIED per type — a date
    spine from the type's OWN first observed day (a late-launching type
    is not "anomalously absent" before it exists) through the GLOBAL
    last observed day (a per-type end would hide a type going
    permanently dark while the feed continues) — so an eventless day
    appears as an explicit zero: a total outage, mid-feed or ongoing at
    the tail, is flagged rather than silently absent, and the ROWS
    frame genuinely means calendar days rather than "the 7 most recent
    days that happened to have events". The test is spelled
    WITHOUT division or floats — z² > Z²  ⇔  (n·c − s)² > Z²·(n·q − s²)
    for count c, window size n, window sum s, window sum-of-squares q —
    so both engines agree bit-for-bit (the same integer-variance move
    as the A7 stddev mart); a zero-variance window flags ANY deviation
    and never flags equality. Only days with a full 7-day history are
    emitted (a partial window has no calibrated baseline).

    Overflow guard (r7, automatic): both sides of the test are bounded
    by 4·n²·max_c², so int64 is safe only while the max daily count
    stays ≤ √(2⁶³)/(2n) ≈ 2.2×10⁸ — beyond that Spark would wrap (or
    raise under ANSI) where DuckDB raises. Instead of advising the
    caller, the operator PRE-SCALES: one global max over the (already
    tiny, post-aggregation) daily relation picks the smallest
    power-of-1000 divisor that brings counts under ANOMALY_SAFE_MAX,
    and the z-test runs on the floor-divided counts (identical integer
    semantics in both engines; scale = 1 — the arithmetic unchanged —
    whenever the data is within bounds, which every test sf is). The
    quantized test at scale > 1 is the documented semantics for
    hot-type corpora: z-scores computed on counts-per-thousand(+).

    Plan shape for 100 TB: the corpus-sized work is ONE partial-
    aggregated groupBy onto (event_type, day); the spine explode and
    the trailing window then run per event_type over |days| rows (W2
    contract: post-aggregation input), column-window passes over the
    same tiny relation."""
    sparse = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            "event_type", F.expr("cast(date_trunc('day', ts) as date)").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # spine: per-type FIRST day (a type that launches late is not
    # "anomalously absent" before it exists) through the GLOBAL last
    # day — per-type max would hide an ongoing tail outage, the
    # headline case (a type going dark while the rest of the feed
    # continues). The global-max relation is 1 row, broadcast — the
    # same sanctioned 1-row-broadcast shape as the zipf corpus total.
    spine = (
        sparse.groupBy("event_type")
        .agg(F.min("day").alias("d0"))
        .crossJoin(F.broadcast(sparse.agg(F.max("day").alias("d1"))))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    daily = spine.join(sparse, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    return _anomaly_flags(daily)


# 4·n²·c² < 2⁶³ for n=7 ⇔ c ≲ 2.17×10⁸; the guard margin keeps every
# term of the integer z-test provably inside int64
ANOMALY_SAFE_MAX = 200_000_000


def _anomaly_flags(daily: DataFrame) -> DataFrame:
    """The windowed z-test over a densified (event_type, day, n_events)
    relation — split out so the overflow pytest can drive it with
    planted near-bound counts. An unpartitioned window-max over the
    tiny densified relation picks the power-of-1000 pre-scale (scale
    stays 1 inside ANOMALY_SAFE_MAX); the test runs on the scaled
    counts, the emitted n_events/win_sum stay raw. Tiers run to 1e12
    (ADVICE r7): mx div tier <= ANOMALY_SAFE_MAX for every
    representable int64 count, so the z-test terms provably fit int64.
    The RAW win_sum output still requires the window's 7-day sum to fit
    int64 (counts <= ~1.3e18/day) — beyond that the unscaled sum the
    operator emits is itself unrepresentable."""
    n = ANOMALY_WINDOW_DAYS
    s = ANOMALY_SAFE_MAX
    # the global max comes from an unpartitioned window over the SAME
    # single pass (daily is the tiny post-aggregation relation, so the
    # one-partition move is |types|·|days| rows) — an agg+crossJoin
    # formulation would plant a second subtree that re-runs the
    # corpus-sized groupBy (no exchange reuse, measured: 6 scans)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = daily.withColumn(
        "mx", F.max("n_events").over(w_all)
    ).withColumn(
        "c_s",
        F.expr(
            f"n_events div (CASE WHEN mx <= {s}L THEN 1L"
            f" WHEN mx <= {s * 1000}L THEN 1000L"
            f" WHEN mx <= {s * 1000_000}L THEN 1000000L"
            f" WHEN mx <= {s * 1000_000_000}L THEN 1000000000L"
            " ELSE 1000000000000L END)"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOMALY_WINDOW_DAYS, -1)
    )
    return (
        scaled.withColumn("win_n", F.count(F.lit(1)).over(w))
        .withColumn("win_sum", F.sum("n_events").over(w))
        .withColumn("win_sum_s", F.sum("c_s").over(w))
        .withColumn("win_sumsq_s", F.sum(F.expr("c_s * c_s")).over(w))
        .where(F.col("win_n") == n)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "win_sum",
            F.expr(
                f"({n}L * c_s - win_sum_s) * ({n}L * c_s - win_sum_s) >"
                f" {ANOMALY_Z * ANOMALY_Z}"
                f" * ({n}L * win_sumsq_s - win_sum_s * win_sum_s)"
            ).alias("is_anomaly"),
        )
    )


# ------------------------------------------------------------- oracle SQL

ORACLES: dict[str, str] = {
    "events_sessionize": f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
),
flagged AS (
    SELECT *,
           CASE WHEN lag(ts_us) OVER w IS NULL
                     OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
    SELECT *,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_idx
    FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(ts_us) AS start_us,
       max(ts_us) AS end_us,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(sum(value_cents) AS BIGINT) AS session_value_cents,
       count(DISTINCT event_type) AS n_event_types
FROM sessions
GROUP BY user_id, session_idx
""",
    "events_asof_join": """
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
clicks AS (
    SELECT user_id, ts_us, max(event_id) AS event_id
    FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us
),
purchases AS (
    SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_event_id,
       p.user_id,
       p.ts_us AS purchase_ts_us,
       c.event_id AS click_event_id,
       c.ts_us AS click_ts_us,
       p.ts_us - c.ts_us AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
""",
    "events_funnel": f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1 AS (
    SELECT *,
           min(CASE WHEN event_type = 'view' THEN ts_us END)
               OVER (PARTITION BY user_id) AS view_ts_us
    FROM ev
),
s2 AS (
    SELECT *,
           min(CASE WHEN event_type = 'click'
                         AND ts_us >= view_ts_us
                         AND ts_us <= view_ts_us + {FUNNEL_WINDOW_US}
                    THEN ts_us END)
               OVER (PARTITION BY user_id) AS click_ts_us
    FROM s1
),
s3 AS (
    SELECT *,
           min(CASE WHEN event_type = 'purchase'
                         AND ts_us >= click_ts_us
                         AND ts_us <= click_ts_us + {FUNNEL_WINDOW_US}
                    THEN ts_us END)
               OVER (PARTITION BY user_id) AS purchase_ts_us
    FROM s2
)
SELECT user_id,
       min(view_ts_us) AS view_ts_us,
       min(click_ts_us) AS click_ts_us,
       min(purchase_ts_us) AS purchase_ts_us,
       CASE WHEN min(purchase_ts_us) IS NOT NULL THEN 3
            WHEN min(click_ts_us) IS NOT NULL THEN 2
            WHEN min(view_ts_us) IS NOT NULL THEN 1 ELSE 0 END
           AS reached_stage,
       min(purchase_ts_us) IS NOT NULL AS converted
FROM s3
GROUP BY user_id
""",
    "events_json_stats": """
WITH ev AS (
    SELECT event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE) AS avg_k,
       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
FROM ev
GROUP BY event_type
""",
}

ORACLES["events_transition_topk"] = f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
    FROM events
),
seq AS (
    SELECT event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS prev_type
    FROM ev
),
pairs AS (
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
),
ranked AS (
    SELECT *,
           CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
               AS from_total,
           row_number() OVER (
               PARTITION BY prev_type
               ORDER BY n_transitions DESC, event_type ASC
           ) AS rank
    FROM pairs
)
SELECT prev_type, event_type, n_transitions, from_total,
       (n_transitions * 10000) // from_total AS rate_bp,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TRANSITION_TOPK}
"""

ORACLES["events_stickiness"] = f"""
WITH du AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
dau AS (
    SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
),
wau AS (
    SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d JOIN du u
      ON u.day <= d.day AND u.day >= d.day - {STICKY_WINDOW_DAYS - 1}
    GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau,
       dau.dau * 1000 // wau.wau AS stickiness_milli,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""

# r6: weekly cohort retention — digest member (events_digest), module
# constant so LLM_CATALOG does not claim a registry slot for it.
RETENTION_ORACLE = """
WITH ev AS (
    SELECT user_id, date_trunc('week', ts) AS week FROM events
    WHERE user_id IS NOT NULL
),
cohorts AS (
    SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
),
cells AS (
    SELECT DISTINCT c.cohort_week,
           date_diff('day', c.cohort_week, e.week) // 7 AS offset_weeks,
           e.user_id
    FROM ev e JOIN cohorts c USING (user_id)
),
retained AS (
    SELECT cohort_week, offset_weeks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS retained
    FROM cells GROUP BY cohort_week, offset_weeks
),
sizes AS (
    SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
    FROM cohorts GROUP BY cohort_week
)
SELECT strftime(r.cohort_week, '%Y-%m-%d') AS cohort_week,
       r.offset_weeks, s.cohort_size, r.retained,
       r.retained * 10000 // s.cohort_size AS retention_bp
FROM retained r JOIN sizes s USING (cohort_week)
"""

_AN = ANOMALY_WINDOW_DAYS
ANOMALY_ORACLE = f"""
WITH sparse AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
),
spine AS (
    SELECT event_type, CAST(unnest(generate_series(d0, d1,
           INTERVAL 1 DAY)) AS DATE) AS day
    FROM (SELECT event_type, min(day) AS d0 FROM sparse GROUP BY event_type)
         CROSS JOIN (SELECT max(day) AS d1 FROM sparse)
),
daily AS (
    SELECT sp.event_type, sp.day,
           COALESCE(s.n_events, 0) AS n_events
    FROM spine sp LEFT JOIN sparse s
      ON sp.event_type = s.event_type AND sp.day = s.day
),
scaled AS (
    SELECT *, n_events // (CASE
               WHEN max(n_events) OVER () <= {ANOMALY_SAFE_MAX} THEN 1
               WHEN max(n_events) OVER () <= {ANOMALY_SAFE_MAX * 1000} THEN 1000
               WHEN max(n_events) OVER () <= {ANOMALY_SAFE_MAX * 1000_000} THEN 1000000
               WHEN max(n_events) OVER () <= {ANOMALY_SAFE_MAX * 1000_000_000} THEN 1000000000
               ELSE 1000000000000 END) AS c_s
    FROM daily
),
win AS (
    SELECT event_type, day, n_events, c_s,
           CAST(count(*) OVER tw AS BIGINT) AS win_n,
           CAST(sum(n_events) OVER tw AS BIGINT) AS win_sum,
           CAST(sum(c_s) OVER tw AS BIGINT) AS win_sum_s,
           CAST(sum(c_s * c_s) OVER tw AS BIGINT) AS win_sumsq_s
    FROM scaled
    WINDOW tw AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN {_AN} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events, win_sum,
       ({_AN} * c_s - win_sum_s) * ({_AN} * c_s - win_sum_s) >
       {ANOMALY_Z * ANOMALY_Z} * ({_AN} * win_sumsq_s - win_sum_s * win_sum_s)
       AS is_anomaly
FROM win WHERE win_n = {_AN}
"""


# ------------------------------- salted skew-join verification (r7)

# 70% of fact rows collapse onto ONE hot key — the deliberate skew that
# makes salting load-bearing rather than decorative
_SKEW_KEY = "CASE WHEN user_id % 10 < 7 THEN 0L ELSE user_id END"


def events_salted_join(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Driver-verified skew-mitigation join (r7): the `salted_join`
    library function (functions/joins.py — the designated 100 TB answer
    for hot-key joins, previously plan/pytest-verified only) run on a
    DELIBERATELY skewed key distribution: 70% of events collapse onto
    one hot key, the rest stay per-user. The fact side joins a derived
    per-key dimension through 16 salts and aggregates per event_type;
    the DuckDB oracle performs the PLAIN join — equality therefore
    proves the salting transform is row-identical to the unsalted join
    (no row met its dim twice, none missed it) under full value
    verification, not just a pytest corpus.

    Scale shape: the fact side gains one map-side hash column; the
    16-way replicated dim stays the small relation; the hot key's work
    spreads over 16 tasks where the plain shuffle would bottleneck one.
    """
    from ..functions.joins import salted_join

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
    )
    fact = ev.withColumn("skew_key", F.expr(_SKEW_KEY))
    dim = (
        fact.select("skew_key")
        .distinct()
        .withColumn("weight", F.expr("skew_key % 97 + 1"))
    )
    joined = salted_join(
        fact, dim, on=["skew_key"], salt_cols=["event_id"], salts=16
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("value_cents * weight")).alias("weighted_cents"),
        F.sum("skew_key").alias("sum_skew_key"),
    )


ORACLES["events_salted_join"] = """
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
),
fact AS (
    SELECT *, CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS skew_key
    FROM ev
),
dim AS (SELECT DISTINCT skew_key, skew_key % 97 + 1 AS weight FROM fact)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(value_cents * weight) AS BIGINT) AS weighted_cents,
       CAST(sum(skew_key) AS BIGINT) AS sum_skew_key
FROM fact JOIN dim USING (skew_key)
GROUP BY event_type
"""


def events_range_join(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Driver-verified interval join (r7): the `range_bin_join` library
    function (functions/joins.py — binning turns a point-in-interval
    predicate into a shuffled equi-join; Catalyst would otherwise plan
    a nested-loop join) joining each purchase event to the same user's
    same-day browsing span (min..max ts of that user-day's view
    events). The DuckDB oracle states the PLAIN range predicate
    (`t BETWEEN lo AND hi` + user equality) — equality proves the
    bin-explode rewrite is row-identical (every in-span purchase met
    its span exactly once, none missed, none doubled).

    Scale shape: spans are one-day intervals binned at one hour, so
    each interval explodes into ≤ 25 bins; the join shuffles on
    (user_id, bin) — partitionable and AQE-splittable where the naive
    plan broadcasts every span against every purchase.
    """
    from ..functions.joins import range_bin_join

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
    )
    spans = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t"),
        "value_cents",
    )
    joined = range_bin_join(
        purchases, spans, "t", "lo", "hi", on=["user_id"],
        bin_width=3_600_000_000,
    )
    return joined.groupBy(
        "user_id", F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_in_span"),
        F.sum("value_cents").alias("span_cents"),
        F.sum("event_id").alias("sum_event_id"),
    )


ORACLES["events_range_join"] = """
WITH ev AS (
    SELECT event_id, user_id, event_type, ts,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
),
spans AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
    FROM ev WHERE event_type = 'view'
    GROUP BY 1, 2
),
purchases AS (
    SELECT event_id, user_id, epoch_us(ts) AS t, value_cents
    FROM ev WHERE event_type = 'purchase'
)
SELECT p.user_id, strftime(s.day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_in_span,
       CAST(sum(p.value_cents) AS BIGINT) AS span_cents,
       CAST(sum(p.event_id) AS BIGINT) AS sum_event_id
FROM purchases p
JOIN spans s ON p.user_id = s.user_id AND p.t BETWEEN s.lo AND s.hi
GROUP BY 1, 2
"""


def events_bloom_join(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Driver-verified Bloom-prefiltered join (r7): the
    `bloom_prefilter_join` library function (functions/joins.py — the
    runtime-filter idea as an explicit operator) joining the events
    fact to BUILDING-segment customers on user_id. Only ~23% of users
    are BUILDING, so the broadcast bitmap drops ~77% of event rows
    BEFORE the join shuffle; the DuckDB oracle performs the PLAIN
    join — equality proves the prefilter dropped only rows that could
    never match (false positives ride to the join and are dropped
    there; false negatives would show as missing rows here).
    """
    from ..functions.joins import bloom_prefilter_join

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
    )
    dim = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("user_id"), "c_acctbal")
    )
    joined = bloom_prefilter_join(ev, dim, on=["user_id"], m_bits=1 << 12)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value_cents").alias("sum_cents"),
        F.sum(F.expr("cast(round(c_acctbal * 100) as bigint)")).alias(
            "sum_acctbal_cents"
        ),
    )


ORACLES["events_bloom_join"] = """
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
),
dim AS (
    SELECT c_custkey AS user_id, c_acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(value_cents) AS BIGINT) AS sum_cents,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_acctbal_cents
FROM ev JOIN dim USING (user_id)
GROUP BY event_type
"""
