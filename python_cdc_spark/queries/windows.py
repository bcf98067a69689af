"""Window/analytic operators (SURVEY.md §2.2 E9, E13, E14, E21, E23).

Determinism: every window ORDER BY ends in a unique key (event_id /
orderkey) so rank/lag/running results are well-defined on both engines.
Running double sums go through per-partition decimal accumulation
(exact → order-independent) like the aggregate helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.queries.registry import register


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) WHERE rnk <= 3
    """,
    doc="E13/E14: top-3 orders per customer via window rank (no global sort)",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group is the scale-safe form of per-group sorting: one
    hash shuffle on the partition key, a per-partition sort, no global
    ordering of the fact table."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(RANK()       OVER w AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
           CAST(NTILE(4)     OVER w AS BIGINT) AS bal_quartile,
           CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS segment_size
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="E13: rank / dense_rank / ntile / windowed count",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("segment_size"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(ts)     OVER w AS prev_ts,
           CAST((epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000 AS BIGINT) AS ms_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="E13: lag/lead navigation over per-user event sequences",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        prev_ts.alias("prev_ts"),
        # integer division on both sides — double division + cast would
        # truncate differently than DuckDB's boundary counting
        ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / F.lit(1000))
        .cast("long").alias("ms_since_prev"),
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
    FROM orders
    """,
    doc="E13: running total per customer (decimal-exact prefix sums)",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@register(
    "asof_join_latest_click",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS click_ts, c.value AS click_value
    FROM purchases p
    LEFT JOIN clicks c ON c.user_id = p.user_id AND c.event_id = (
      SELECT c2.event_id FROM clicks c2
      WHERE c2.user_id = p.user_id AND c2.ts <= p.ts
      ORDER BY c2.ts DESC, c2.event_id DESC LIMIT 1
    )
    """,
    doc="E9: as-of join — each purchase matched to the user's latest prior click",
)
def asof_join_latest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join as a union + last_value(ignore nulls) window — a single
    shuffle on user_id, linear in events, no range cross-join. This is
    the composite recipe SURVEY.md E9 prescribes; at 100 TB it scales as
    one sort-within-partition per key."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    tagged = purchases.select(
        "event_id", "user_id", "ts", "value",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_value"),
        F.lit(1).alias("is_p"),
    ).unionByName(
        clicks.select(
            "event_id", "user_id", "ts", "value",
            F.col("ts").alias("c_ts"), F.col("value").alias("c_value"),
            F.lit(0).alias("is_p"),
        )
    )
    # clicks sort before purchases at identical ts (is_p ascending) so a
    # same-timestamp click is visible to the purchase — matching the
    # oracle's c2.ts <= p.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("click_value", F.last("c_value", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "value", "click_ts", "click_value")
    )


@register(
    "sessionize_events",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) >= 1800 * 1000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, CAST(SUM(is_new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM seq
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="E21 batch analog: gap-based sessionization (30 min) via windows",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: the same semantics Structured Streaming's
    session_window gives on a stream (see streaming module)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact integer-microsecond gap on BOTH engines (oracle: epoch_us diff).
    # date_diff('second') would count second-boundary crossings instead —
    # a 1799.3 s gap crossing a boundary sessionizes differently.
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    seq = ev.withColumn(
        "is_new_session",
        F.when(gap_us.isNull() | (gap_us >= 1800 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = seq.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="E23 batch analog: keep first event per (user, type)",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "timeseries_moving_avg",
    oracle="""
    SELECT user_id, event_id, ts, value,
           CAST(SUM(CAST(value AS DECIMAL(30,10)))
                  OVER w_frame AS DOUBLE)
             / COUNT(value) OVER w_frame AS moving_avg_4,
           CAST(COUNT(*) OVER w_frame AS BIGINT) AS frame_size
    FROM events
    WINDOW w_frame AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="E13: time-series smoothing — 4-event moving average per user",
)
def timeseries_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-frame moving aggregate (the resample/smooth primitive of
    time-series pipelines); decimal-routed so the frame sum is exact."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (
            F.sum(F.col("value").cast("decimal(30,10)")).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("moving_avg_4"),
        F.count(F.lit(1)).over(w).alias("frame_size"),
    )


@register(
    "median_exact_order_stat",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)
             AS median_price,
           MAX(n) AS n_orders
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY o_orderstatus
    """,
    doc="E11: exact median via order statistics (engine-portable, unlike "
    "interpolated percentile functions)",
)
def median_exact_order_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median as the mean of the middle order statistic(s): selecting
    rows by row_number sidesteps the interpolation arithmetic that
    makes native percentile() results engine-specific."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    # integer-division semantics: (n+1)//2 and (n+2)//2
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("o_orderstatus").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("median_price"),
        F.max("n").alias("n_orders"),
    )


@register(
    "window_trailing_range_1h",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_events_trailing_1h,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))) OVER w, 4) AS DOUBLE)
             AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="E13: value-based (RANGE) window frame — trailing 1-hour per-user stats",
)
def window_trailing_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames bound by event-time intervals (the sliding-metric
    primitive); expressed through Spark SQL since the Python Window API
    only takes numeric range bounds."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_range_v")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_events_trailing_1h,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))) OVER w, 4) AS DOUBLE)
                 AS value_trailing_1h
        FROM events_range_v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "events_funnel_ordered",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users, 1 AS o FROM s
      UNION ALL
      SELECT 'click_after_signup', CAST(COUNT(*) AS BIGINT), 2 FROM c
      UNION ALL
      SELECT 'purchase_after_click', CAST(COUNT(*) AS BIGINT), 3 FROM p
    ) ORDER BY o
    """,
    doc="E13/analytics: ordered conversion funnel — users reaching "
    "signup → later click → later purchase, each stage anchored to the "
    "previous stage's first completion time",
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: stage N counts only events at-or-after the
    user's first stage-N-1 completion (a filter on ts, not mere
    membership). Three keyed aggregations + broadcast-friendly joins on
    user_id — no windows over the full event stream, so the plan is
    three hash shuffles regardless of history depth."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    spark_ = spark
    rows = [
        s.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit("signup").alias("stage"), "n_users", F.lit(1).alias("o")
        ),
        c.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit("click_after_signup").alias("stage"), "n_users", F.lit(2).alias("o")
        ),
        p.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit("purchase_after_click").alias("stage"), "n_users", F.lit(3).alias("o")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("o").drop("o")


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                          CAST(a.act_week AS DATE)) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM first_seen f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    doc="E13/analytics: weekly cohort retention — users grouped by "
    "first-seen week, counted per subsequent active week offset",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: cohort = week of each user's first event;
    n_users active per (cohort, week-offset). Two keyed aggregations +
    one join on user_id; week arithmetic stays integral (day diff
    div 7) so both engines agree exactly."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("act_week").cast("date"), F.col("cohort_week").cast("date"))
                / F.lit(7)
            ).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "timeseries_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM b
    ),
    spine AS (
      SELECT t.event_type, g.bucket_ts
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
        FROM bounds
      ) g
    ),
    j AS (
      SELECT s.event_type, s.bucket_ts,
             COALESCE(b.n_events, 0) AS n_events,
             b.sum_value
      FROM spine s LEFT JOIN b
        ON b.event_type = s.event_type AND b.bucket_ts = s.bucket_ts
    ),
    f AS (
      SELECT event_type, bucket_ts, n_events, sum_value,
             last_value(sum_value IGNORE NULLS) OVER wprev AS prev_val,
             last_value(CASE WHEN sum_value IS NOT NULL THEN bucket_ts END
                        IGNORE NULLS) OVER wprev AS prev_ts,
             first_value(sum_value IGNORE NULLS) OVER wnext AS next_val,
             first_value(CASE WHEN sum_value IS NOT NULL THEN bucket_ts END
                         IGNORE NULLS) OVER wnext AS next_ts
      FROM j
      WINDOW
        wprev AS (PARTITION BY event_type ORDER BY bucket_ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wnext AS (PARTITION BY event_type ORDER BY bucket_ts
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket_ts, n_events, sum_value,
           prev_val AS locf_value,
           CASE
             WHEN sum_value IS NOT NULL THEN sum_value
             WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
             ELSE prev_val + (next_val - prev_val)
                  * (CAST(date_diff('hour', prev_ts, bucket_ts) AS DOUBLE)
                     / CAST(date_diff('hour', prev_ts, next_ts) AS DOUBLE))
           END AS interp_value,
           CAST(CASE WHEN sum_value IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
    FROM f
    """,
    doc="E13/timeseries: hypertable-style gap-fill — dense hourly bucket "
    "spine per event_type, LOCF and linear interpolation across gaps",
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (the time_bucket_gapfill / locf /
    interpolate trio of timeseries stores) as pure DataFrame ops:

    - bucket aggregate: one hash shuffle on (event_type, hour) —
      map-side partial agg absorbs hot hours;
    - spine: bounds are a 1-row global aggregate (broadcast) crossed
      with the distinct types (metadata-scale, 5 rows) and exploded
      with ``sequence`` — the spine is generated, never shuffled at
      corpus scale;
    - fill: LOCF = ``last(ignorenulls)`` over the per-type window,
      linear interpolation from the bracketing observations. Interp
      arithmetic is double ops over identical operands on both engines
      (hour offsets are exact integers), so results are bit-identical.

    At 100 TB the spine is O(types x buckets) — output-scale, not
    input-scale; the only corpus-wide exchange is the bucket aggregate.
    """
    from python_cdc_spark.queries.helpers import dec_sum

    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dec_sum(F.col("value"), "sum_value"),
        )
    )
    bounds = b.agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(
        bounds.select(
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("bucket_ts")
        )
    )
    j = spine.join(b, ["event_type", "bucket_ts"], "left").select(
        "event_type",
        "bucket_ts",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        "sum_value",
    )
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    observed_ts = F.when(F.col("sum_value").isNotNull(), F.col("bucket_ts"))
    f = j.select(
        "event_type",
        "bucket_ts",
        "n_events",
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(wprev).alias("prev_val"),
        F.last(observed_ts, ignorenulls=True).over(wprev).alias("prev_ts"),
        F.first("sum_value", ignorenulls=True).over(wnext).alias("next_val"),
        F.first(observed_ts, ignorenulls=True).over(wnext).alias("next_ts"),
    )
    hours = lambda a, b: (  # noqa: E731
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(3600)
    ).cast("long")
    interp = (
        F.when(F.col("sum_value").isNotNull(), F.col("sum_value"))
        .when(F.col("prev_val").isNull() | F.col("next_val").isNull(), F.lit(None))
        .otherwise(
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val"))
            * (
                hours(F.col("prev_ts"), F.col("bucket_ts")).cast("double")
                / hours(F.col("prev_ts"), F.col("next_ts")).cast("double")
            )
        )
    )
    return f.select(
        "event_type",
        "bucket_ts",
        "n_events",
        "sum_value",
        F.col("prev_val").alias("locf_value"),
        interp.alias("interp_value"),
        (F.col("sum_value").isNull()).cast("int").alias("is_gap"),
    )


@register(
    "events_anomaly_mad",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sum_value
      FROM events GROUP BY 1, 2
    ),
    r1 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY sum_value, bucket_ts) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM b
    ),
    med AS (
      SELECT event_type,
             CAST(SUM(CAST(sum_value AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)
               AS median_sum
      FROM r1 WHERE rn IN ((n + 1) // 2, (n + 2) // 2) GROUP BY 1
    ),
    d AS (
      SELECT b.event_type, b.bucket_ts, b.sum_value, m.median_sum,
             abs(b.sum_value - m.median_sum) AS dev
      FROM b JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY dev, bucket_ts) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM d
    ),
    mad AS (
      SELECT event_type,
             CAST(SUM(CAST(dev AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS mad
      FROM r2 WHERE rn IN ((n + 1) // 2, (n + 2) // 2) GROUP BY 1
    )
    SELECT d.event_type, d.bucket_ts, d.sum_value, d.median_sum, mad.mad,
           d.dev > CAST('4.4478' AS DOUBLE) * mad.mad AS is_anomaly
    FROM d JOIN mad USING (event_type)
    """,
    doc="E13/monitoring: robust hourly anomaly flags per event_type — "
    "median + MAD via exact order statistics (no interpolated "
    "percentiles), threshold 3 x 1.4826 x MAD",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detection: per type, hourly value sums are
    scored against median ± 3·1.4826·MAD. Median and MAD are EXACT
    order statistics (mean of the two middle elements, decimal-routed)
    — interpolated percentile functions differ across engines, order
    statistics cannot. Two windowed ranks + two tiny aggregates; the
    bucket table is output-scale, so this whole monitor costs one
    corpus aggregate regardless of input size."""
    from python_cdc_spark.queries.helpers import dec_sum

    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
        ).agg(dec_sum(F.col("value"), "sum_value"))
    )

    def mid_mean(df, val, order_tiebreak, out):
        w = Window.partitionBy("event_type").orderBy(F.col(val), F.col(order_tiebreak))
        ranked = df.select(
            "event_type",
            val,
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
        )
        mid = ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        return mid.groupBy("event_type").agg(
            (
                F.sum(F.col(val).cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias(out)
        )

    med = mid_mean(b, "sum_value", "bucket_ts", "median_sum")
    d = b.join(med, "event_type").withColumn(
        "dev", F.abs(F.col("sum_value") - F.col("median_sum"))
    )
    mad = mid_mean(d, "dev", "bucket_ts", "mad")
    return (
        d.join(mad, "event_type")
        .select(
            "event_type",
            "bucket_ts",
            "sum_value",
            "median_sum",
            "mad",
            (F.col("dev") > F.lit(4.4478) * F.col("mad")).alias("is_anomaly"),
        )
    )


@register(
    "events_cusum_drift",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sum_value
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(ROUND(SUM(CAST(sum_value AS DECIMAL(30,10))), 4) AS DOUBLE)
               / COUNT(*) AS mean_sum
      FROM b GROUP BY 1
    ),
    p AS (
      SELECT b.event_type, b.bucket_ts, b.sum_value,
             CAST(ROUND(SUM(CAST(b.sum_value - m.mean_sum AS DECIMAL(30,10)))
                    OVER (PARTITION BY b.event_type ORDER BY b.bucket_ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  4) AS DOUBLE) AS prefix_dev
      FROM b JOIN m USING (event_type)
    )
    SELECT event_type, bucket_ts, sum_value, prefix_dev,
           prefix_dev - least(CAST(0.0 AS DOUBLE), min(prefix_dev)
             OVER (PARTITION BY event_type ORDER BY bucket_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum
    FROM p
    """,
    doc="E13/monitoring: CUSUM upward-drift statistic per event_type — "
    "computed as prefix-sum minus running-min (the window-expressible "
    "form of the recursive max(0, s+x) CUSUM), decimal-routed",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point / drift detection: the textbook CUSUM recursion
    s_t = max(0, s_{t-1} + (x_t - target)) is not a plain window
    aggregate, but it equals p_t - min(0, p_1..p_t) where p is the
    prefix sum of deviations — two ordinary windows, fully parallel per
    type. The implicit p_0 = 0 term in the running min matters: when
    the deviation prefix stays positive (immediate upward drift — the
    regime the monitor exists for), omitting it understates the
    statistic, e.g. x=(2,3) must yield cusum=(2,5), not (0,3)
    (test-pinned).
    Prefix sums are decimal-routed (order-exact); the subtraction is
    identical doubles on both engines. Downstream alerting thresholds
    cusum directly; the statistic is output-scale (one row per
    bucket)."""
    from python_cdc_spark.queries.helpers import dec_sum

    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(dec_sum(F.col("value"), "sum_value"))
    m = b.groupBy("event_type").agg(
        (
            F.round(F.sum(F.col("sum_value").cast("decimal(30,10)")), 4).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_sum")
    )
    wprefix = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = (
        b.join(m, "event_type")
        .withColumn(
            "prefix_dev",
            F.round(
                F.sum(
                    (F.col("sum_value") - F.col("mean_sum")).cast("decimal(30,10)")
                ).over(wprefix),
                4,
            ).cast("double"),
        )
    )
    return p.select(
        "event_type",
        "bucket_ts",
        "sum_value",
        "prefix_dev",
        (
            F.col("prefix_dev")
            - F.least(F.lit(0.0), F.min("prefix_dev").over(wprefix))
        ).alias("cusum"),
    )


@register(
    "timeseries_ewma_recursive",
    oracle="""
    WITH RECURSIVE b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sum_value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('hour', ts)) AS rn
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, rn, bucket_ts, sum_value, sum_value AS ewma
      FROM b WHERE rn = 1
      UNION ALL
      SELECT b.event_type, b.rn, b.bucket_ts, b.sum_value,
             0.25 * b.sum_value + 0.75 * r.ewma
      FROM b JOIN r ON b.event_type = r.event_type AND b.rn = r.rn + 1
    )
    SELECT event_type, bucket_ts, sum_value, ewma FROM r
    """,
    doc="E24/E29: per-key EWMA — a genuinely recursive fold "
    "(s_t = α·x_t + (1-α)·s_{t-1}) no window aggregate expresses; "
    "Arrow-batched applyInPandas per event_type, DuckDB recursive-CTE "
    "oracle, α=1/4 so every constant is exact binary and both engines' "
    "IEEE op sequences are identical",
)
def timeseries_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented escape hatch, used where it is genuinely needed:
    EWMA's recurrence is not a prefix-sum identity (unlike CUSUM's
    max(0,·) form), so no composition of built-in window aggregates
    yields it exactly — the one closed form (Σ α(1-α)^(t-j)·x_j)
    overflows its weights at sequence length. Instead: one hash
    aggregate to hourly buckets (decimal-routed), then
    ``applyInPandas`` PER EVENT_TYPE — each group is output-scale
    (one row per hour) and groups parallelize across executors, so the
    Python boundary is Arrow-batched, per-key bounded, and off the
    fact-table hot path. α = 1/4 (exact in binary, like its complement
    3/4): the pandas loop and the recursive-CTE oracle execute the
    same multiply-add sequence → bit-identical doubles."""
    import pandas as pd

    from python_cdc_spark.queries.helpers import dec_sum

    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(dec_sum(F.col("value"), "sum_value"))

    alpha, beta = 0.25, 0.75

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        out = []
        s = None
        for x in pdf["sum_value"]:
            s = x if s is None else alpha * x + beta * s
            out.append(s)
        pdf["ewma"] = out
        return pdf

    return b.groupBy("event_type").applyInPandas(
        ewma,
        schema="event_type string, bucket_ts timestamp, sum_value double, "
        "ewma double",
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type) AS prob
    FROM c
    """,
    doc="E13/analytics: first-order Markov transition matrix over "
    "per-user event sequences — lag window per user (bounded state), "
    "transition counts, row-normalized probabilities",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-model input: sequence each user's events (per-user
    window — hash-partitioned, bounded per key, never global), count
    (prev → next) transitions, normalize rows into probabilities. The
    normalizing window runs over the O(types²) count matrix —
    output-scale. Integer counts → double division, both engines
    identical."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wnorm = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wnorm)).alias("prob"),
    )


@register(
    "timeseries_autocorrelation",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sum_value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('hour', ts)) AS rn
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT cur.event_type, l.lag, cur.sum_value AS x, prev.sum_value AS y
      FROM b cur
      CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6)) AS l(lag)
      JOIN b prev ON prev.event_type = cur.event_type
                 AND prev.rn = cur.rn - l.lag
    ),
    m AS (
      SELECT event_type, CAST(lag AS BIGINT) AS lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(ROUND(SUM(CAST(x AS DECIMAL(30,10))), 4) AS DOUBLE) AS sx,
             CAST(ROUND(SUM(CAST(y AS DECIMAL(30,10))), 4) AS DOUBLE) AS sy,
             CAST(ROUND(SUM(CAST(x * y AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sxy,
             CAST(ROUND(SUM(CAST(x * x AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sxx,
             CAST(ROUND(SUM(CAST(y * y AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag, n_pairs,
           CASE WHEN n_pairs * sxx - sx * sx <= 0
                  OR n_pairs * syy - sy * sy <= 0 THEN NULL
                ELSE (n_pairs * sxy - sx * sy)
                     / (sqrt(n_pairs * sxx - sx * sx)
                        * sqrt(n_pairs * syy - sy * sy))
           END AS acf
    FROM m
    """,
    doc="E13/analytics: autocorrelation function at lags 1-6 per "
    "event_type over hourly buckets — lagged self-join on row_number "
    "against an exploded lag dimension, Pearson components "
    "decimal-routed, zero-variance guarded to NULL on both engines",
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality/persistence diagnostic: ACF(L) = corr(x_t, x_{t-L})
    for L in 1..6 on the hourly per-type series. The series is
    output-scale (one row per hour per type), so the lag join — an
    equi-join on (event_type, rn-L) against a 6-row exploded lag
    dimension — never touches the fact table a second time. Pearson
    sufficient statistics (Sx Sy Sxy Sxx Syy) are decimal-routed for
    order independence; the closed form runs in identical IEEE doubles
    on both engines (sqrt is correctly rounded per IEEE-754, so it is
    deterministic cross-engine, unlike ln/log2). Zero-variance series
    (constant buckets) yield NULL, not NaN, via the same guard in both
    dialects."""
    from python_cdc_spark.queries.helpers import dec_sum

    ev = table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
        )
        .agg(dec_sum(F.col("value"), "sum_value"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("bucket_ts")
            ),
        )
    )
    lags = spark.range(1, 7).select(F.col("id").alias("lag"))
    cur = b.select(
        "event_type", F.col("rn").alias("crn"), F.col("sum_value").alias("x")
    )
    prev = b.select(
        F.col("event_type").alias("p_event_type"),
        F.col("rn").alias("prn"),
        F.col("sum_value").alias("y"),
    )
    pairs = (
        cur.crossJoin(F.broadcast(lags))  # 6-row lag dimension
        .join(
            prev,
            (F.col("p_event_type") == F.col("event_type"))
            & (F.col("prn") == F.col("crn") - F.col("lag")),
        )
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        dec_sum(F.col("x"), "sx"),
        dec_sum(F.col("y"), "sy"),
        dec_sum(F.col("x") * F.col("y"), "sxy"),
        dec_sum(F.col("x") * F.col("x"), "sxx"),
        dec_sum(F.col("y") * F.col("y"), "syy"),
    )
    n = F.col("n_pairs").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        "lag",
        "n_pairs",
        F.when((vx <= 0) | (vy <= 0), F.lit(None).cast("double"))
        .otherwise(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(vx) * F.sqrt(vy))
        )
        .alias("acf"),
    )


@register(
    "window_value_navigation",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER w_full AS first_type,
           last_value(event_type) OVER w_full AS last_type,
           nth_value(event_type, 2) OVER w_full AS second_type,
           lead(event_type, 1, 'none') OVER w_ord AS next_type,
           CASE WHEN COUNT(*) OVER w_user = 1 THEN 0.0
                ELSE CAST(RANK() OVER w_val - 1 AS DOUBLE)
                     / (COUNT(*) OVER w_user - 1)
           END AS pct_rank,
           CAST(COUNT(*) OVER w_cume AS DOUBLE)
             / COUNT(*) OVER w_user AS cume_dist,
           value
    FROM events
    WINDOW
      w_ord AS (PARTITION BY user_id ORDER BY ts, event_id),
      w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING),
      w_user AS (PARTITION BY user_id),
      w_val AS (PARTITION BY user_id ORDER BY value, event_id),
      w_cume AS (PARTITION BY user_id ORDER BY value, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="E13: value-navigation window functions — first/last/nth_value "
    "over an explicit full frame, lead with default, and percent_rank/"
    "cume_dist computed from rank/count identities (unique-key order "
    "ties broken by event_id, so every engine sees the same frame)",
)
def window_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the E13 navigation surface: positional picks
    (first/last/nth) over the FULL per-user frame (explicit ROWS
    UNBOUNDED..UNBOUNDED — default frames end at CURRENT ROW and differ
    in meaning for last_value), a defaulted lead, and the two
    distribution functions. percent_rank/cume_dist are written from
    their defining identities ((rank-1)/(n-1), running_count/n) so both
    engines compute the same integer ratios — and the w_val ordering
    ends in event_id, making rank deterministic even on tied values.
    All windows hash-partition by user_id (bounded per key, never
    global)."""
    ev = table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_user = Window.partitionBy("user_id")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    w_cume = w_val.rowsBetween(Window.unboundedPreceding, 0)
    n_user = F.count(F.lit(1)).over(w_user)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w_full).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w_full).alias("second_type"),
        F.lead("event_type", 1, "none").over(w_ord).alias("next_type"),
        F.when(n_user == 1, F.lit(0.0))
        .otherwise(
            (F.rank().over(w_val) - F.lit(1)).cast("double")
            / (n_user - F.lit(1))
        )
        .alias("pct_rank"),
        (
            F.count(F.lit(1)).over(w_cume).cast("double") / n_user
        ).alias("cume_dist"),
        "value",
    )


@register(
    "timeseries_seasonal_profile",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour_of_day, n, sum_value,
           sum_value / n AS mean_value,
           sum_value
             / CAST(ROUND(SUM(CAST(sum_value AS DECIMAL(30,10)))
                            OVER (PARTITION BY event_type), 4) AS DOUBLE)
             AS share_of_type
    FROM h
    """,
    doc="E13/analytics: hour-of-day seasonal profile per event_type — "
    "one hash aggregate to a types x 24 grid, per-type share via a "
    "window over the output-scale grid; decimal-routed sums",
)
def timeseries_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diurnal-shape companion to the ACF diagnostic: bucket every
    event into (type, hour-of-day), then mean load and the hour's share
    of the type's total. One scan collapses the fact table to a
    types x 24 grid map-side; the normalizing window runs over that
    grid, never the raw events. share_of_type divides two doubles
    derived from the same exact decimal sums, so both engines compute
    the identical IEEE quotient. Downstream: diurnal weighting for
    traffic-aware sampling, anomaly baselines per hour-of-day."""
    from python_cdc_spark.queries.helpers import dec_sum

    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dec_sum(F.col("value"), "sum_value"),
    )
    w = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "hour_of_day",
        "n",
        "sum_value",
        (F.col("sum_value") / F.col("n")).alias("mean_value"),
        (
            F.col("sum_value")
            / F.round(
                F.sum(F.col("sum_value").cast("decimal(30,10)")).over(w), 4
            ).cast("double")
        ).alias("share_of_type"),
    )
