"""Business-analytics pack (SURVEY.md §2.2 E5/E10/E13 applications).

Moved out of queries/relational.py (registry names unchanged): the
histogram / RFM / YoY / market-basket / skew-report queries that apply
the core operator surface to the analytics questions a warehouse user
actually asks. Cross-engine determinism follows the registry
conventions (decimal-routed sums, unique-order tiebreaks, explicit
BIGINT/INTEGER casts in the oracles).

Scale notes specific to this pack:

- ``customer_rfm_segments`` ranks with the distributed exact NTILE from
  operators/ranking.py — bucket-parallel windows, never a
  single-partition global sort (the r4 perf-weak finding).
- ``part_affinity_lift`` caps basket size deterministically before the
  pair self-join (the r4 perf-weak finding): pair volume is bounded by
  cap² per order even against a mega-basket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.io import table
from python_cdc_spark.operators.ranking import with_distributed_ntile
from python_cdc_spark.queries.helpers import dec_sum
from python_cdc_spark.queries.registry import register


@register(
    "events_histogram_equiwidth",
    oracle="""
    WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
    SELECT event_type,
           CASE WHEN b.mx = b.mn THEN 1
                ELSE CAST(FLOOR((value - b.mn) / (b.mx - b.mn) * 16) + 1
                          AS INTEGER)
           END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events, b
    GROUP BY 1, 2
    """,
    doc="E10/profiling: per-type equi-width value histograms — explicit "
    "width-bucket arithmetic over broadcast global bounds (identical "
    "IEEE ops on both engines; the max lands in overflow bucket 17, "
    "matching SQL-standard width_bucket; a degenerate all-equal column "
    "collapses to one bucket instead of dividing by zero)",
)
def events_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram as one scan + one tiny aggregate: bounds come from a
    1-row broadcast aggregate, bucketing is the SQL-standard
    width_bucket (identical edge semantics on both engines: values at
    the upper bound land in the overflow bucket n+1), and the output is
    O(types x buckets) — the profiler's distribution companion. When
    max == min (constant/filtered metric) every value maps to bucket 1
    rather than NaN/Infinity arithmetic that diverges across engines."""
    ev = table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    width_bucket = (
        F.floor((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 16)
        + 1
    ).cast("int")
    return (
        ev.crossJoin(broadcast(b))
        .select(
            "event_type",
            F.when(F.col("mx") == F.col("mn"), F.lit(1))
            .otherwise(width_bucket)
            .alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS now FROM orders),
    per_cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate), ref.now) AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 4) AS DOUBLE)
               AS monetary
      FROM orders, ref GROUP BY o_custkey, ref.now
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS INTEGER)
             AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER)
             AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS INTEGER)
             AS m_score
    FROM per_cust
    """,
    doc="E13/analytics: RFM customer segmentation — recency/frequency/"
    "monetary quintiles via the distributed exact NTILE "
    "(operators/ranking.py): bucket-parallel ranking, bit-identical to "
    "the oracle's single-partition ntile",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic marketing segmentation as two aggregates + three
    exact-quintile rankings: per-customer stats are one hash aggregate
    (monetary decimal-routed), the reference date is a 1-row broadcast,
    and each quintile runs through operators/ranking.py's distributed
    NTILE — approx-quantile range buckets + per-bucket row_number +
    exact cumulative offsets, so the window parallelizes across buckets
    while reproducing single-partition ntile(5) bit-for-bit (the
    boundaries only affect load balance, never the result). At 100 TB
    the per-customer table is billions of rows; nothing here funnels it
    through one task. Tiebreak (metric, o_custkey) keeps the order
    total, matching the oracle."""
    o = table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("now"))
    per_cust = (
        o.crossJoin(broadcast(ref))
        .groupBy("o_custkey", "now")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            dec_sum(F.col("o_totalprice"), "monetary"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("now").cast("date"), F.col("last_order").cast("date"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=False)
    )
    # rank each metric on its own 2-column projection of the CHECKPOINTED
    # per-customer table, then join the three score columns back on the
    # key: every ranking's plan-build actions (quantile sketch, bucket
    # counts) scan only per_cust, never a previous ranking's window —
    # chaining them instead re-executed window 1 five times (measured
    # 4.3 s → this shape at sf1)
    def score(metric: str, ascending: bool, out: str) -> DataFrame:
        return with_distributed_ntile(
            per_cust.select("o_custkey", metric),
            5,
            metric,
            ascending=ascending,
            tiebreak=("o_custkey",),
            out=out,
        ).select("o_custkey", out)

    return (
        per_cust.join(score("recency_days", True, "r_score"), "o_custkey")
        .join(score("frequency", False, "f_score"), "o_custkey")
        .join(score("monetary", False, "m_score"), "o_custkey")
        .select(
            "o_custkey", "recency_days", "frequency", "monetary",
            "r_score", "f_score", "m_score",
        )
    )


@register(
    "revenue_yoy_growth",
    oracle="""
    WITH y AS (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(30,10))), 4) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY 1
    )
    SELECT ship_year, revenue,
           lag(revenue) OVER (ORDER BY ship_year) AS prev_revenue,
           CASE WHEN lag(revenue) OVER (ORDER BY ship_year) IS NOT NULL
                THEN revenue / lag(revenue) OVER (ORDER BY ship_year) - 1.0
           END AS yoy_growth
    FROM y
    """,
    doc="E13/analytics: year-over-year revenue growth — yearly decimal "
    "aggregate + lag; ratios divide identical doubles on both engines",
)
def revenue_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: the corpus-wide work is ONE yearly
    aggregate (decimal-routed revenue); lag and the growth ratio run
    on the O(years) result. The single-partition window is fine
    because its input is output-scale."""
    li = table(spark, sf_dir, "lineitem")
    y = li.groupBy(
        F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    w = Window.orderBy("ship_year")
    prev = F.lag("revenue").over(w)
    return y.select(
        "ship_year",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(prev.isNotNull(), F.col("revenue") / prev - 1.0).alias("yoy_growth"),
    )


# Deterministic per-basket item cap: pair volume from the co-occurrence
# self-join is Σ min(basket, cap)² instead of the unbounded Σ basket².
# TPC-H baskets top out at 7 items so the cap is invisible at test
# scale; against a mega-basket (one order holding half the catalog —
# the classic market-basket blowup) it bounds the join output. The cap
# keeps the LOWEST partkeys per order: deterministic, engine-portable,
# and mirrored verbatim in the oracle so both sides see the same items.
BASKET_CAP = 64


def capped_basket_items(li: DataFrame, cap: int = BASKET_CAP) -> DataFrame:
    """Distinct (order, part) pairs, at most ``cap`` parts per order
    (lowest partkeys win). The per-order window is hash-partitioned on
    the order key — bounded state per key, no global sort."""
    items = li.select("l_orderkey", "l_partkey").distinct()
    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        items.withColumn("__irank", F.row_number().over(w))
        .filter(F.col("__irank") <= cap)
        .drop("__irank")
    )


@register(
    "part_affinity_lift",
    oracle=f"""
    WITH ranked AS (
      SELECT l_orderkey, l_partkey,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
               AS irank
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    ),
    items AS (
      SELECT l_orderkey, l_partkey FROM ranked WHERE irank <= {BASKET_CAP}
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
    supp AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    )
    SELECT p.part_a, p.part_b, p.n_both, sa.n AS n_a, sb.n AS n_b,
           (CAST(p.n_both AS DOUBLE) * n.n_orders)
             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
    FROM pairs p
    JOIN supp sa ON sa.l_partkey = p.part_a
    JOIN supp sb ON sb.l_partkey = p.part_b
    CROSS JOIN n
    """,
    doc="E5/analytics: market-basket part affinity — co-occurrence "
    "pairs within orders with a deterministic per-basket item cap "
    f"(lowest {BASKET_CAP} partkeys), support floor, exact count-ratio "
    "lift",
)
def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining's first mile: pair generation self-joins the
    (order, part) item table on the order key. Baskets are capped at
    BASKET_CAP items (lowest partkeys, per-order window) BEFORE the
    join, so pair volume is Σ min(basket, cap)² — bounded even against
    a skewed mega-basket, the classic blowup of the uncapped self-join
    (the r4 perf-weak finding; cap pinned by the mega-basket fixture
    test). A support floor (>=3 co-orders) bounds the output; lift =
    n_both·N / (n_a·n_b) is pure integer-derived arithmetic — exact on
    both engines. TPC-H baskets are ~4 items, so the cap never binds at
    test scale and the oracle applies the identical cap."""
    li = table(spark, sf_dir, "lineitem")
    items = capped_basket_items(li).localCheckpoint(eager=False)
    n = items.agg(F.count_distinct("l_orderkey").cast("long").alias("n_orders"))
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double") * F.col("n_orders")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


@register(
    "join_key_skew_report",
    oracle="""
    WITH u AS (
      SELECT 'events.user_id' AS key_col, CAST(user_id AS VARCHAR) AS k
      FROM events
      UNION ALL
      SELECT 'events.event_type', event_type FROM events
      UNION ALL
      SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR) FROM lineitem
    ),
    c AS (
      SELECT key_col, k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM u GROUP BY 1, 2
    )
    SELECT key_col,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_cnt,
           CAST(MAX(cnt) AS DOUBLE) / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*))
             AS skew_factor,
           max_by(k, lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || k) AS hottest_key
    FROM c GROUP BY key_col
    """,
    doc="E10/diagnostics: join-key skew report — per candidate key: "
    "cardinality, hottest-key count, skew factor (max/avg); the "
    "pre-flight check that decides salting / AQE skew handling",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic that precedes every big join: per candidate key
    column, count cardinality, the hottest key, and skew factor
    max/avg — the number that says whether hash partitions will
    balance (operators/skew.py holds the mitigations this report
    triggers). Two aggregations per key: per-key counts (map-side
    combine absorbs the hot key), then an O(keys) summary. Ties on the
    hottest key break by key string, both engines."""
    ev = table(spark, sf_dir, "events")
    li = table(spark, sf_dir, "lineitem")
    u = (
        ev.select(
            F.lit("events.user_id").alias("key_col"),
            F.col("user_id").cast("string").alias("k"),
        )
        .unionAll(
            ev.select(
                F.lit("events.event_type").alias("key_col"),
                F.col("event_type").alias("k"),
            )
        )
        .unionAll(
            li.select(
                F.lit("lineitem.l_orderkey").alias("key_col"),
                F.col("l_orderkey").cast("string").alias("k"),
            )
        )
    )
    c = u.groupBy("key_col", "k").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return c.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("avg_cnt"),
        (
            F.max("cnt").cast("double")
            / (F.sum("cnt").cast("double") / F.count(F.lit(1)))
        ).alias("skew_factor"),
        F.max_by(
            "k",
            F.concat(
                F.lpad(F.col("cnt").cast("string"), 12, "0"), F.lit("|"), F.col("k")
            ),
        ).alias("hottest_key"),
    )


@register(
    "events_exact_deciles",
    oracle="""
    WITH ranked AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS rn,
             count(*) OVER () AS n
      FROM events
    ),
    d AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS decile)
    SELECT d.decile, r.value AS decile_value
    FROM d JOIN ranked r
      ON r.rn = CAST(CEIL(d.decile * r.n / 10.0) AS BIGINT)
    """,
    doc="E11/E13: EXACT global deciles of events.value via the "
    "distributed ranking operator — rank-selected order statistics "
    "(value at rank ceil(d*n/10)), bit-identical to a single-partition "
    "row_number scan, computed bucket-parallel",
)
def events_exact_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics at fact-table scale: approx_percentile is
    the usual answer because exact percentile needs a global sort —
    operators/ranking.py removes that tradeoff. One approx-quantile
    pass range-buckets the rows (balance only, never correctness), a
    per-bucket row_number plus exact cumulative offsets yields the true
    global rank, and the nine decile rows come from a 9-row broadcast
    join on rank. Ties are ordered by (value, event_id) on both
    engines, so the selected rows are identical. Work: one shuffle for
    the bucketed window + an O(buckets) offsets collect."""
    import math

    from python_cdc_spark.operators.ranking import with_global_row_number

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    ranked, total = with_global_row_number(
        ev, "value", ascending=True, tiebreak=("event_id",), out="rn"
    )
    targets = ", ".join(
        f"({d}, {math.ceil(d * total / 10)})" for d in range(1, 10)
    )
    tgt = spark.sql(f"SELECT * FROM VALUES {targets} AS t(decile, rn)")
    return (
        ranked.join(broadcast(tgt.withColumn("decile", F.col("decile").cast("int"))), "rn")
        .select("decile", F.col("value").alias("decile_value"))
    )


@register(
    "parts_pareto_abc",
    oracle="""
    WITH r AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(30,10))) * 100, 0) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT l_partkey, rev_cents,
             SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents,
             SUM(rev_cents) OVER () AS total_cents
      FROM r
    )
    SELECT l_partkey, rev_cents,
           CAST(cum_cents AS BIGINT) AS cum_cents,
           CAST(cum_cents AS DOUBLE) / total_cents AS cum_share,
           CASE WHEN CAST(cum_cents AS DOUBLE) / total_cents <= 0.80 THEN 'A'
                WHEN CAST(cum_cents AS DOUBLE) / total_cents <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
    doc="E13/analytics: Pareto / ABC inventory classification — exact "
    "global cumulative revenue share via the distributed prefix-sum "
    "operator (integer cents, bucket-parallel, bit-identical to a "
    "single-partition running total)",
)
def parts_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/15/5 classification every inventory team runs, at a part
    cardinality where a bare `SUM() OVER (ORDER BY …)` would funnel the
    whole catalog through one task: revenue per part is one decimal
    hash aggregate, encoded as EXACT integer cents (decimal multiply +
    round — no float drift, no decimal precision-capping on the running
    sum), and the cumulative total runs through
    operators/ranking.with_global_prefix_sum_long — per-bucket running
    sums plus exact integer offsets of all higher-revenue buckets.
    Share and class derive from (long / long) double division —
    identical on both engines. Tiebreak (rev desc, partkey) keeps the
    order total."""
    from python_cdc_spark.operators.ranking import with_global_prefix_sum_long

    li = table(spark, sf_dir, "lineitem")
    r = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,10)"
                )
            )
            * 100,
            0,
        )
        .cast("long")
        .alias("rev_cents")
    )
    c, total = with_global_prefix_sum_long(
        r,
        "rev_cents",
        "rev_cents",
        ascending=False,
        tiebreak=("l_partkey",),
        out="cum_cents",
    )
    share = F.col("cum_cents").cast("double") / F.lit(float(total))
    return c.select(
        "l_partkey",
        "rev_cents",
        "cum_cents",
        share.alias("cum_share"),
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@register(
    "data_quality_checks",
    oracle="""
    WITH li AS (
      SELECT CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS bad_qty,
             CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS bad_price,
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS null_ship
      FROM lineitem
    ),
    ord AS (
      SELECT CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS null_odate,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS bad_total
      FROM orders
    ),
    dup_cust AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1)
    ),
    dup_li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY 1, 2 HAVING COUNT(*) > 1)
    ),
    orphan_ord AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    ),
    orphan_li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT DISTINCT l_orderkey FROM lineitem) li
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    ),
    ship_before AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate < o_orderdate
    )
    SELECT * FROM (
      SELECT 'lineitem_quantity_nonpositive' AS constraint_name,
             bad_qty AS n_violations FROM li
      UNION ALL SELECT 'lineitem_price_negative', bad_price FROM li
      UNION ALL SELECT 'lineitem_discount_out_of_range', bad_disc FROM li
      UNION ALL SELECT 'lineitem_shipdate_null', null_ship FROM li
      UNION ALL SELECT 'orders_orderdate_null', null_odate FROM ord
      UNION ALL SELECT 'orders_totalprice_nonpositive', bad_total FROM ord
      UNION ALL SELECT 'customer_pk_duplicates', n FROM dup_cust
      UNION ALL SELECT 'lineitem_pk_duplicates', n FROM dup_li
      UNION ALL SELECT 'orders_custkey_orphans', n FROM orphan_ord
      UNION ALL SELECT 'lineitem_orderkey_orphans', n FROM orphan_li
      UNION ALL SELECT 'lineitem_shipped_before_ordered', n FROM ship_before
    )
    """,
    doc="E10/E7/analytics: data-quality constraint suite as ONE plan — "
    "range/null checks fused into one conditional-aggregate scan per "
    "table, PK-duplicate checks via groupBy-having, referential "
    "integrity via anti joins, cross-table temporal sanity via an "
    "equi-join; output is (constraint_name, n_violations)",
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-flight every pipeline needs before shipping a table
    downstream. Shape matters at 100 TB: all range/null checks against
    a table fuse into ONE conditional-aggregate scan (not one scan per
    rule); duplicate-PK checks are hash aggregates with a HAVING
    filter; referential checks are anti joins (broadcast when the PK
    side is dimension-sized); the temporal check rides the same
    orderkey equi-join the engine already co-partitions. Everything
    reduces to one bigint per constraint before the union, so the
    combine is metadata-scale."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")

    def one(name: str, col) -> DataFrame:
        return col.select(
            F.lit(name).alias("constraint_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    cnt = F.count(F.lit(1)).cast("long").alias("n")
    li_scan = li.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("bad_qty"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("bad_price"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("bad_disc"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_ship"),
    )
    ord_scan = od.agg(
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_odate"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("bad_total"),
    )
    dup_cust = (
        cu.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(cnt)
    )
    dup_li = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(cnt)
    )
    orphan_ord = od.join(
        broadcast(cu.select("c_custkey")),
        od["o_custkey"] == F.col("c_custkey"),
        "anti",
    ).agg(cnt)
    orphan_li = (
        li.select("l_orderkey")
        .distinct()
        .join(od.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "anti")
        .agg(cnt)
    )
    ship_before = (
        li.select("l_orderkey", "l_shipdate")
        .join(od.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(cnt)
    )

    # stack() unpivots the one-row aggregate in place — ONE scan per
    # table feeds all of that table's constraints, never one per rule
    li_rows = li_scan.select(
        F.expr(
            "stack(4,"
            " 'lineitem_quantity_nonpositive', bad_qty,"
            " 'lineitem_price_negative', bad_price,"
            " 'lineitem_discount_out_of_range', bad_disc,"
            " 'lineitem_shipdate_null', null_ship"
            ") as (constraint_name, n_violations)"
        )
    )
    ord_rows = ord_scan.select(
        F.expr(
            "stack(2,"
            " 'orders_orderdate_null', null_odate,"
            " 'orders_totalprice_nonpositive', bad_total"
            ") as (constraint_name, n_violations)"
        )
    )
    parts = (
        [li_rows, ord_rows]
        + [
            one("customer_pk_duplicates", dup_cust),
            one("lineitem_pk_duplicates", dup_li),
            one("orders_custkey_orphans", orphan_ord),
            one("lineitem_orderkey_orphans", orphan_li),
            one("lineitem_shipped_before_ordered", ship_before),
        ]
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out



def _ship_cube(spark: SparkSession, sf_dir: str):
    """The SHARED lineitem shipping cube (one definition, many queries
    — two registered queries rewriting onto different measure subsets
    must agree on params, or each run would rebuild the other's cube;
    the harness runs queries SEQUENTIALLY, which is what makes the
    shared single-writer catalog safe).
    Measures: decimal revenue/qty partials, item count, and an HLL
    register sketch of l_partkey — the measure that makes COUNT
    DISTINCT decomposable in a cube."""
    import hashlib as _hashlib
    import os as _os

    from python_cdc_spark.operators.ann_index import source_fingerprint
    from python_cdc_spark.plans.rollup import RollupCatalog

    # Cache keyed on a hash of the ABSOLUTE dataset path: two sf dirs
    # sharing a basename (or runs from different CWDs) must not collide
    # on one cache entry — the stat fingerprint would keep results
    # correct but thrash rebuilds on every alternation.
    key = _hashlib.md5(
        _os.path.abspath(sf_dir.rstrip("/")).encode()
    ).hexdigest()[:16]
    cat = RollupCatalog(spark, _os.path.join(".rollup_cache", key))
    li = table(spark, sf_dir, "lineitem")
    cat.define(
        "lineitem_ship_cube",
        li,
        dims={
            "ship_year": "year(l_shipdate)",
            "l_returnflag": "l_returnflag",
            "l_linestatus": "l_linestatus",
        },
        measures={
            "revenue_sum": ("sum", "l_extendedprice * (1 - l_discount)"),
            "qty_sum": ("sum", "l_quantity"),
            "n_items": ("count", "1"),
            "partkey_hll": ("hll", "l_partkey"),
        },
        fingerprint=source_fingerprint(
            _os.path.join(sf_dir, "lineitem.parquet")
        ),
    )
    return cat


@register(
    "rollup_revenue_rewrite",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,10))), 4) AS DOUBLE)
             AS revenue_sum,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_linestatus = 'F'
    GROUP BY 1, 2
    """,
    doc="plans/rollup: MATERIALIZED ROLLUP + QUERY REWRITE — the query "
    "is answered from a persisted (year, returnflag, linestatus) cube "
    "via subsumption (dims subset, predicate on a rollup dim), never "
    "touching the fact table after the one-time build; decimal partials "
    "make the rewrite bit-identical to the direct plan",
)
def rollup_revenue_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard-query shape at 100 TB: revenue by (ship_year,
    returnflag) for finished lineitems, answered FROM a materialized
    rollup. ``RollupCatalog.define`` is load-or-build (stat-fingerprint
    staleness, same discipline as the ANN index store), so only the
    first call per testdata generation scans lineitem; every later run
    reads the ~40-row cube, filters the ``l_linestatus`` dimension, and
    re-aggregates the DECIMAL sum partials — exact and associative, so
    the result is bit-identical to the direct aggregation the oracle
    computes. The same cube answers any dims-subset query (year-only,
    flag-only, full cross) — one build, a family of queries."""
    from python_cdc_spark.plans.rollup import finalize_sum_double

    cat = _ship_cube(spark, sf_dir)
    out = cat.rewrite(
        dims=["ship_year", "l_returnflag"],
        measures=["revenue_sum", "n_items"],
        predicate="l_linestatus = 'F'",
        predicate_dims=["l_linestatus"],
    )
    return finalize_sum_double(out, ["revenue_sum"]).select(
        F.col("ship_year").cast("int").alias("ship_year"),
        "l_returnflag",
        "revenue_sum",
        "n_items",
    )


from python_cdc_spark.queries.sketches import _sql_mix32 as _mix_sql  # noqa: E402

_PART_MIX = _mix_sql("l_partkey")


@register(
    "rollup_distinct_parts_rewrite",
    oracle=f"""
    WITH h AS (
      SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
             {{mix}} AS h
      FROM lineitem
    ),
    reg AS (
      SELECT ship_year, h % 256 AS bucket,
             MAX(CASE WHEN (h >> 8) = 0 THEN 25
                      ELSE 25 - length(bin(h >> 8)) END) AS r
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT ship_year, CAST(COUNT(*) AS BIGINT) AS b_used,
             SUM(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << r)) AS s_obs
      FROM reg GROUP BY 1
    ),
    ex AS (
      SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
      FROM lineitem GROUP BY 1
    )
    SELECT agg.ship_year,
           (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
             / (s_obs + (256.0 - b_used)) AS distinct_parts_est,
           exact_parts,
           ABS((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                 / (s_obs + (256.0 - b_used))
               / CAST(exact_parts AS DOUBLE) - 1.0) AS rel_err
    FROM agg JOIN ex ON agg.ship_year = ex.ship_year
    """.replace("{mix}", _PART_MIX),
    doc="plans/rollup: COUNT DISTINCT from the cube — the partkey HLL "
    "register sketch stored as a rollup MEASURE makes the one "
    "non-decomposable aggregate decomposable: rewrite folds registers "
    "by max across the rolled-up dims and applies the shared estimator, "
    "replayed exactly by the oracle over the raw rows",
)
def rollup_distinct_parts_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) is the aggregate a plain cube CANNOT answer for
    arbitrary dims subsets — distinct counts don't add across groups.
    Storing HLL registers as a cube measure fixes that: registers fold
    by MAX when (returnflag, linestatus) roll away, so ONE pass over
    lineitem gives approximate distinct-part counts for every dims
    subset forever after. The fold is algebraically exact (max of
    per-group maxes == global max), so the cube path and a direct
    register build over the raw rows produce the IDENTICAL register
    table — which is what lets the DuckDB oracle replay the estimate
    bit-for-bit. Exact counts (one distinct agg, for the rel_err
    column) ride alongside; typical error at m=256 is 3-6%."""
    cat = _ship_cube(spark, sf_dir)
    est = cat.rewrite(dims=["ship_year"], measures=["partkey_hll"])
    li = table(spark, sf_dir, "lineitem")
    ex = li.groupBy(
        F.expr("year(l_shipdate)").cast("int").alias("ship_year")
    ).agg(F.countDistinct("l_partkey").cast("long").alias("exact_parts"))
    out = est.join(ex, "ship_year")
    e = F.col("partkey_hll")
    return out.select(
        F.col("ship_year").cast("int").alias("ship_year"),
        e.alias("distinct_parts_est"),
        "exact_parts",
        F.abs(e / F.col("exact_parts").cast("double") - F.lit(1.0)).alias(
            "rel_err"
        ),
    )
