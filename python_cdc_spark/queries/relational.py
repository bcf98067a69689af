"""Relational operator surface (SURVEY.md §2.2 E3–E17).

Each query is the canonical Spark expression of one operator family with
a DuckDB oracle twin. Cross-engine determinism notes:

- ``year()``/``count()``-style functions return int32 in Spark and int64
  in DuckDB — Spark side casts to long.
- ``round()`` on raw doubles is NOT portable (Spark rounds the shortest
  decimal repr, DuckDB the binary value) — use floor/ceil on scaled
  values or the decimal-sum helpers instead.
- Pivot cells with no rows are NULL in Spark but 0 for DuckDB COUNT —
  coalesce on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.io import table
from python_cdc_spark.queries.helpers import dec_sum, sql_dec_sum
from python_cdc_spark.queries.registry import register


@register(
    "projection_compute",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substr(p_type, 1, 3) AS type_prefix,
           length(p_name) AS name_len,
           p_name || '/' || p_brand AS name_brand,
           replace(p_name, ' ', '_') AS name_snake,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           p_retailprice * p_size AS price_x_size,
           CAST(length(p_name) AS BIGINT) % 7 AS name_mod
    FROM part
    """,
    doc="E3/E16: projection with computed string/math columns",
)
def projection_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_name", "p_brand").alias("name_brand"),
        F.expr("replace(p_name, ' ', '_')").alias("name_snake"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        (F.col("p_retailprice") * F.col("p_size")).alias("price_x_size"),
        (F.length("p_name").cast("long") % 7).alias("name_mod"),
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_acctbal BETWEEN 100 AND 9000
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_name LIKE 'Customer%'
      AND c_nationkey IS NOT NULL
      AND NOT (c_acctbal < 0)
    """,
    doc="E4: compound predicates — between, in-list, like, null checks",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_acctbal").between(100, 9000)
        & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_name").like("Customer%")
        & F.col("c_nationkey").isNotNull()
        & ~(F.col("c_acctbal") < 0)
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


@register(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           {sql_dec_sum('o_totalprice', 'total_spend')}
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="E5: left outer join preserving customers without orders",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dec_sum(F.col("o_totalprice"), "total_spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    doc="E7: left-semi join (EXISTS)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="E7: left-anti join (NOT EXISTS) — customers with no orders",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_range_theta",
    oracle="""
    SELECT s_suppkey, s_name, COUNT(c_custkey) AS n_close_customers
    FROM supplier LEFT JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey, s_name
    """,
    doc="E8: non-equi (band) join — customers within ±100 acctbal of each supplier",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta joins have no hash path; Spark plans BroadcastNestedLoopJoin
    with the small side broadcast — the right call at scale too (supplier
    is the small build side; band predicates can additionally be bucketed
    by range binning when both sides are large)."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    cond = F.col("c_acctbal").between(F.col("s_acctbal") - 100, F.col("s_acctbal") + 100)
    return (
        broadcast(s)
        .join(c, cond, "left")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("c_custkey").alias("n_close_customers"))
    )


@register(
    "join_range_banded",
    oracle="""
    SELECT s_suppkey, s_name, COUNT(*) AS n_close_customers
    FROM supplier JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey, s_name
    """,
    doc="E8 at scale: the same band predicate as join_range_theta, "
    "executed as a banded equi-join (no nested-loop) — the path for "
    "when BOTH sides are corpus-scale",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-binned range join: suppliers explode to the <=2 width-200
    bands their +-100 window overlaps, customers hash into their own
    band, and the join is a keyed shuffle join + exact re-filter —
    identical semantics to the BNL plan, but shuffle-partitioned so it
    survives two large inputs (see operators/rangejoin.py)."""
    from python_cdc_spark.operators.rangejoin import banded_range_join

    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pairs = banded_range_join(s, c, "s_acctbal", "c_acctbal", radius=100.0)
    return pairs.groupBy("s_suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("n_close_customers")
    )


@register(
    "interval_concurrency",
    oracle="""
    WITH b AS (
      SELECT CAST(o_orderdate AS DATE) AS d, 1 AS delta FROM orders
      UNION ALL
      SELECT CAST(o_orderdate AS DATE) + 31 AS d, -1 AS delta FROM orders
    ),
    daily AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM b GROUP BY d
    )
    SELECT d, net,
           CAST(SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS in_flight
    FROM daily
    """,
    doc="E8/E13 at scale: interval-stabbing aggregation (orders inside "
    "their 30-day fulfillment window per day) via the boundary-sweep "
    "rewrite — +1/-1 boundary events, distributed daily aggregate, "
    "cumulative sum over the tiny date spine (never an interval×date "
    "join)",
)
def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are inside their 30-day fulfillment window on
    each calendar day. The naive plan joins every interval to every day
    it covers (O(rows × days)); the sweep emits two boundary events per
    interval, aggregates per day distributed, and runs the cumulative
    sum over the ~2.4k-row date spine — the global orderBy window
    touches only that metadata-scale frame."""
    o = table(spark, sf_dir, "orders")
    start = F.to_date("o_orderdate")
    bounds = o.select(start.alias("d"), F.lit(1).alias("delta")).unionAll(
        o.select(F.date_add(start, 31).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = bounds.groupBy("d").agg(F.sum("delta").cast("long").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select("d", "net", F.sum("net").over(w).alias("in_flight"))


@register(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dec_sum('c_acctbal', 'total_acctbal')},
           COUNT(*) AS n_customers,
           CAST(GROUPING(r_name) AS BIGINT) * 2 + CAST(GROUPING(n_name) AS BIGINT)
             AS grouping_level
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="E12: rollup with grouping() disambiguation of null groups",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            dec_sum(F.col("c_acctbal"), "total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.grouping("r_name").cast("long") * 2 + F.grouping("n_name").cast("long")
            ).alias("grouping_level"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(GROUPING(o_orderstatus) AS BIGINT) * 2
             + CAST(GROUPING(o_orderpriority) AS BIGINT) AS grouping_level
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="E12: cube over status × priority",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.grouping("o_orderstatus").cast("long") * 2
            + F.grouping("o_orderpriority").cast("long")
        ).alias("grouping_level"),
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT c_mktsegment) AS n_segments,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(DISTINCT c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR))
             AS n_segment_nation_pairs,
           COUNT(*) AS n_rows
    FROM customer
    """,
    doc="E11: multi count-distinct (expand-based in Spark)",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct(
            F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string"))
        ).alias("n_segment_nation_pairs"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
    doc="E17: pivot with explicit value list (no collect of pivot keys)",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("status_P"),
    )


@register(
    "set_operations",
    oracle="""
    WITH b AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         a AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM b UNION SELECT * FROM a)
    UNION ALL
    SELECT 'intersect', COUNT(*) FROM (SELECT * FROM b INTERSECT SELECT * FROM a)
    UNION ALL
    SELECT 'except', COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """,
    doc="E15: union / intersect / except",
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey").distinct()
    return (
        b.union(a).distinct().agg(F.count(F.lit(1)).alias("n")).select(F.lit("union").alias("op"), "n")
        .unionByName(
            b.intersect(a).agg(F.count(F.lit(1)).alias("n")).select(F.lit("intersect").alias("op"), "n")
        )
        .unionByName(
            b.subtract(a).agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("except").alias("op"), "n")
        )
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_mon,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch_start
    FROM orders
    """,
    doc="E16: date/time scalar functions",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # DuckDB's date_trunc('month') yields DATE; match it.
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_epoch_start"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000) AS abs_diff,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           sqrt(l_extendedprice) AS price_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 10 AS BIGINT) AS key_mod,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey <= 1000
    """,
    doc="E16: math scalar functions (IEEE-deterministic subset)",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_diff"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 10).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "json_extraction",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
    doc="E16: JSON field extraction from the events.props column",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
        (k.cast("long") % 10).alias("k_bucket"),
    )


@register(
    "case_when_bucketing",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS balance_bucket,
           COUNT(*) AS n,
           {sql_dec_sum('c_acctbal', 'total_bal')}
    FROM customer GROUP BY 1
    """,
    doc="E3/E10: CASE WHEN bucketing + aggregation",
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        c.withColumn("balance_bucket", bucket)
        .groupBy("balance_bucket")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum(F.col("c_acctbal"), "total_bal"))
    )


@register(
    "grouping_sets_sql",
    oracle=f"""
    SELECT c_mktsegment, n_name, COUNT(*) AS n,
           {sql_dec_sum('c_acctbal', 'total_bal')}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
    """,
    doc="E12: GROUPING SETS via Spark SQL",
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demonstrates the SQL entry path (spark.sql over registered views)
    rather than the DataFrame DSL."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, n_name, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 4) AS DOUBLE) AS total_bal
        FROM customer_gs JOIN nation_gs ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        """
    )


@register(
    "salted_agg_returnflag",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dec_sum('l_quantity', 'sum_qty')},
           COUNT(*) AS n_rows,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="E10 skew idiom: salted two-phase aggregation ≡ direct groupBy",
)
def salted_agg_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key GROUP BY through operators.skew.salted_groupby — the
    oracle is the PLAIN aggregation, asserting the salting is invisible
    in results (decimal sums stay exact across the extra phase)."""
    from python_cdc_spark.operators.skew import salted_groupby

    li = table(spark, sf_dir, "lineitem")
    out = salted_groupby(
        li,
        ["l_returnflag"],
        [
            (F.col("l_quantity").cast("decimal(30,10)"), "sum", "__qty_dec"),
            (F.lit(1), "count", "n_rows"),
            (F.col("l_shipdate"), "min", "first_ship"),
            (F.col("l_shipdate"), "max", "last_ship"),
        ],
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("__qty_dec"), 4).cast("double").alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "first_ship",
        "last_ship",
    )


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_pad,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
           split_part(p_brand, '#', 2) AS brand_id,
           CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
           left(p_name, 4) AS name_head,
           repeat(p_type, 2) AS type_twice,
           reverse(p_name) AS name_rev,
           CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS brand_dist
    FROM part
    """,
    doc="E16: extended string functions (pad/translate/split_part/levenshtein)",
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels"),
        F.split_part("p_brand", F.lit("#"), F.lit(2)).alias("brand_id"),
        F.instr("p_name", "e").cast("long").alias("first_e"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.repeat("p_type", 2).alias("type_twice"),
        F.reverse("p_name").alias("name_rev"),
        F.levenshtein("p_brand", F.lit("Brand#1")).cast("long").alias("brand_dist"),
    )


def _scaled_long(x):
    """float → deterministic long via exact IEEE double ops (widen, scale,
    floor). Identical bit-for-bit on Spark and DuckDB, unlike float→string
    formatting or ROUND on doubles (engine-specific half-rounding)."""
    return F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast("long")


_SCALED_SQL = "CAST(FLOOR(CAST({x} AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"


@register(
    "array_functions",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dims,
           array_to_string(list_transform(embedding[2:5],
               x -> CAST({_SCALED_SQL.format(x='x')} AS VARCHAR)), ',') AS head_slice,
           embedding[1] AS first_elem,
           embedding[len(embedding)] AS last_elem,
           list_max(embedding) AS max_elem,
           list_min(embedding) AS min_elem,
           array_to_string(list_transform(
               list_sort(list_transform(embedding[1:4],
                   x -> {_SCALED_SQL.format(x='x')})),
               x -> CAST(x AS VARCHAR)), ',') AS sorted_head,
           list_contains(embedding, 0.0::FLOAT) AS has_zero
    FROM embeddings
    """,
    doc="E16: array functions over the embedding column (list outputs "
    "serialized to deterministic strings for the harness comparator)",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(v).cast("long").alias("dims"),
        F.array_join(
            F.transform(F.slice(v, 2, 4), lambda x: _scaled_long(x).cast("string")), ","
        ).alias("head_slice"),
        F.element_at(v, 1).alias("first_elem"),
        F.element_at(v, F.size(v)).alias("last_elem"),
        F.array_max(v).alias("max_elem"),
        F.array_min(v).alias("min_elem"),
        F.array_join(
            F.transform(
                F.sort_array(F.transform(F.slice(v, 1, 4), _scaled_long)),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("sorted_head"),
        F.array_contains(v, F.lit(0.0).cast("float")).alias("has_zero"),
    )


@register(
    "table_row_counts",
    oracle="""
    SELECT 'region' AS tbl, COUNT(*) AS n FROM region
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'events', COUNT(*) FROM events
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    """,
    doc="R17 diagnostics analog: row counts across every source table",
)
def table_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The utils.py-style admin sweep (reference utils.py:100-109) as a
    single unioned count query (metadata-only parquet scans)."""
    from python_cdc_spark.schemas import ANALYTIC_TABLES

    out = None
    for name in ANALYTIC_TABLES:
        one = table(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("tbl"), "n"
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "map_functions",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS BIGINT) AS n_props,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           json_extract_string(props, '$.missing') AS missing_value
    FROM events
    """,
    doc="E16: map/JSON-object functions over the events.props column "
    "(key list serialized to a sorted joined string for the comparator)",
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed to map<string,string> (the same shape CDC row images
    use), then inspected with map functions."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).cast("long").alias("n_props"),
        F.element_at(m, "k").cast("long").alias("k_value"),
        F.element_at(m, "missing").alias("missing_value"),
    )


# (col, kind) for the profiler; kind picks which min/max slot is filled.
_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "str"),  # timestamp → ISO string min/max
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c, kind in _PROFILE_COLS:
        aggs.append(f"CAST(COUNT({c}) AS BIGINT) AS {c}__nn")
        aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}__nd")
        if kind == "num":
            aggs.append(f"CAST(MIN({c}) AS DOUBLE) AS {c}__mn")
            aggs.append(f"CAST(MAX({c}) AS DOUBLE) AS {c}__mx")
        else:
            aggs.append(f"MIN(CAST({c} AS VARCHAR)) AS {c}__mn")
            aggs.append(f"MAX(CAST({c} AS VARCHAR)) AS {c}__mx")
    branches = []
    for c, kind in _PROFILE_COLS:
        mn_num = f"{c}__mn" if kind == "num" else "NULL"
        mx_num = f"{c}__mx" if kind == "num" else "NULL"
        mn_str = f"{c}__mn" if kind == "str" else "NULL"
        mx_str = f"{c}__mx" if kind == "str" else "NULL"
        branches.append(
            f"SELECT '{c}' AS col_name, n_rows, n_rows - {c}__nn AS n_null, "
            f"{c}__nd AS n_distinct, CAST({mn_num} AS DOUBLE) AS min_num, "
            f"CAST({mx_num} AS DOUBLE) AS max_num, "
            f"CAST({mn_str} AS VARCHAR) AS min_str, "
            f"CAST({mx_str} AS VARCHAR) AS max_str FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(aggs) + " FROM orders) "
        + " UNION ALL ".join(branches)
    )


@register(
    "profile_column_stats",
    oracle=_profile_oracle(),
    doc="E10/E11: ANALYZE-style table profiler — per-column nulls, exact "
    "NDV, min/max in ONE pass over the table (single aggregate row, "
    "unpivoted to one row per column)",
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data profiler (the stats a cost-based optimizer or a
    data-quality monitor wants): one wide aggregate computes count /
    non-null count / exact distinct / min / max for every column, then
    the 1-row result is unpivoted driver-free into (column x stats).

    Scale: ONE scan of the table regardless of column count. The
    multiple COUNT(DISTINCT)s expand to a single Expand+aggregate plan
    (rows x n_cols intermediate), which is the standard exact-NDV
    trade; swap in approx_count_distinct per column when a 2% error is
    acceptable and the Expand is the bottleneck. The unpivot runs on a
    1-row DataFrame — no second scan, no collect.
    """
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(c).cast("long").alias(f"{c}__nn"))
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"{c}__nd"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__mx"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__mn"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__mx"))
    s = o.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    branches = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__mn") if kind == "num" else null_d).alias("min_num"),
            (F.col(f"{c}__mx") if kind == "num" else null_d).alias("max_num"),
            (F.col(f"{c}__mn") if kind == "str" else null_s).alias("min_str"),
            (F.col(f"{c}__mx") if kind == "str" else null_s).alias("max_str"),
        )
        for c, kind in _PROFILE_COLS
    ]
    return s.select(F.explode(F.array(*branches)).alias("p")).select("p.*")


@register(
    "unpivot_quarterly_revenue",
    oracle="""
    WITH w AS (
      SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
             CAST(ROUND(SUM(CASE WHEN quarter(l_shipdate) = 1
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))
                 ELSE CAST(0 AS DECIMAL(30,10)) END), 4) AS DOUBLE) AS q1,
             CAST(ROUND(SUM(CASE WHEN quarter(l_shipdate) = 2
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))
                 ELSE CAST(0 AS DECIMAL(30,10)) END), 4) AS DOUBLE) AS q2,
             CAST(ROUND(SUM(CASE WHEN quarter(l_shipdate) = 3
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))
                 ELSE CAST(0 AS DECIMAL(30,10)) END), 4) AS DOUBLE) AS q3,
             CAST(ROUND(SUM(CASE WHEN quarter(l_shipdate) = 4
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))
                 ELSE CAST(0 AS DECIMAL(30,10)) END), 4) AS DOUBLE) AS q4
      FROM lineitem GROUP BY 1
    )
    SELECT ship_year, 'q1' AS quarter, q1 AS revenue FROM w
    UNION ALL SELECT ship_year, 'q2', q2 FROM w
    UNION ALL SELECT ship_year, 'q3', q3 FROM w
    UNION ALL SELECT ship_year, 'q4', q4 FROM w
    """,
    doc="E17 inverse: wide-to-long via the native unpivot (melt) "
    "operator — quarterly revenue pivoted wide by conditional "
    "aggregation, then unpivoted back to (year, quarter, revenue); "
    "decimal-routed sums keep both directions exact",
)
def unpivot_quarterly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot's inverse, exercised round-trip: one conditional-aggregate
    scan builds the wide (year x q1..q4) table — decimal-routed so the
    per-quarter sums are order-exact — then Spark's native ``unpivot``
    (melt) reshapes wide→long without touching the fact table again.
    The wide table is output-scale (one row per year), so the reshape
    is metadata-cost; the oracle replays it as a UNION ALL over the
    same wide CTE, the relational identity of unpivot."""
    from python_cdc_spark.queries.helpers import dec_sum

    li = table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    zero = F.lit(0).cast("decimal(30,10)")
    qcol = F.quarter("l_shipdate")
    wide = li.groupBy(
        F.expr("year(l_shipdate)").cast("int").alias("ship_year")
    ).agg(
        *[
            F.round(F.sum(F.when(qcol == q, rev).otherwise(zero)), 4)
            .cast("double")
            .alias(f"q{q}")
            for q in (1, 2, 3, 4)
        ]
    )
    return wide.unpivot(
        ["ship_year"], ["q1", "q2", "q3", "q4"], "quarter", "revenue"
    )
