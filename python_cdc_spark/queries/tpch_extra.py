"""Extended TPC-H-style coverage (adapted to the driver's columns) plus
deterministic statistics operators.

Adaptations (the driver tables lack partsupp/commitdate/shipmode/phone):
Q9's supplycost → synthetic 0.5·retailprice, Q12's shipmode → order
priority classes, Q22's phone prefix → account-balance screen only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.io import table
from python_cdc_spark.queries.helpers import dec_sum, sql_dec_sum
from python_cdc_spark.queries.registry import register

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4: priority counts for orders with late-shipped items (semi join)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_dec_sum(_REV, 'revenue')}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: cross-nation shipping volume by year",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_rev AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(ROUND(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END
                 AS DECIMAL(30,10))), 4) AS DOUBLE)
             / CAST(ROUND(SUM(CAST(volume AS DECIMAL(30,10))), 4) AS DOUBLE)
             AS mkt_share
    FROM all_rev GROUP BY o_year
    """,
    doc="TPC-H Q8: one nation's market share inside a region, by year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(30,10)"
    target = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.round(F.sum(target.cast(dec)), 4).cast("double")
                / F.round(F.sum(vol.cast(dec)), 4).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_dec_sum('l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity', 'profit')}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (adapted: synthetic supply cost): profit by nation/year",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dec_sum(profit, "profit"))
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_priority_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_priority_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 (shipmode→priority): priority class counts per linestatus",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: distribution of orders-per-customer (double aggregation)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {sql_dec_sum(_REV, 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15: supplier(s) with maximum period revenue",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    w = Window.partitionBy()
    top = rev.withColumn("__mx", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("__mx")
    )
    return top.join(s, F.col("supplier_no") == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q16_part_type_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#11' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (via lineitem): distinct suppliers per part group",
)
def q16_part_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey AS pk,
             0.2 * (CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 4) AS DOUBLE)
                      / COUNT(l_quantity)) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dec_sum('l_extendedprice', 'total_price')}, COUNT(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON pk = l_partkey
    WHERE p_brand = 'Brand#21' AND l_quantity < threshold
    """,
    doc="TPC-H Q17: below-average-quantity orders (per-part avg join)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_cdc_spark.queries.helpers import dec_avg

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#21")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * dec_avg(F.col("l_quantity"), "a").cast("double")).alias("threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            dec_sum(F.col("l_extendedprice"), "total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q22_dormant_customers",
    oracle=f"""
    WITH pos_avg AS (
      SELECT CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 4) AS DOUBLE)
               / COUNT(c_acctbal) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust, {sql_dec_sum('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_acctbal > (SELECT a FROM pos_avg)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (adapted): wealthy customers with no orders, by nation",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_cdc_spark.queries.helpers import dec_avg

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    pos_avg = c.filter(F.col("c_acctbal") > 0).agg(
        dec_avg(F.col("c_acctbal"), "a")
    )
    return (
        c.join(broadcast(pos_avg))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "stats_deterministic_moments",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(value) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE) AS s1,
             CAST(ROUND(SUM(CAST(value * value AS DECIMAL(30,10))), 4) AS DOUBLE) AS s2,
             MIN(value) AS min_v, MAX(value) AS max_v
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, min_v, max_v,
           s1 / n AS mean_v,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_v
    FROM s
    """,
    doc="E11/E16: order-independent moments (mean/stddev from decimal sums)",
)
def stats_deterministic_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev via Σx/Σx² (exact decimal accumulation) instead of the
    engine-native streaming variance, which is order-dependent and not
    reproducible across engines."""
    ev = table(spark, sf_dir, "events")
    dec = "decimal(30,10)"
    s1 = F.round(F.sum(F.col("value").cast(dec)), 4).cast("double")
    s2 = F.round(F.sum((F.col("value") * F.col("value")).cast(dec)), 4).cast("double")
    n = F.count("value")
    grouped = ev.groupBy("event_type").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    return grouped.select(
        "event_type",
        "n",
        "min_v",
        "max_v",
        (F.col("s1") / F.col("n")).alias("mean_v"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
        ).alias("stddev_v"),
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
               / COUNT(DISTINCT user_id) - 1.0) <= 0.1 AS approx_ok
    FROM events GROUP BY event_type
    """,
    doc="E11: approx_count_distinct (HLL) per event type. Raw sketch values "
    "are engine-specific, so the hashed output is the exact count plus a "
    "tolerance boolean (approx within 10%% of exact) — true on both engines.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02).cast("double")
                / F.countDistinct("user_id")
                - 1.0
            )
            <= 0.1
        ).alias("approx_ok"),
    )


@register(
    "percentile_order_values",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           MAX(CASE WHEN rn = CAST(CEIL(0.5  * n) AS BIGINT) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT) THEN o_totalprice END) AS p95,
           MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN o_totalprice END) AS p99
    FROM ranked GROUP BY o_orderstatus
    """,
    doc="E11: discrete percentiles (actual elements, no interpolation) of "
    "order value per status. percentile_disc picks the smallest value with "
    "cume_dist >= p == the element at rank ceil(p*n); the oracle applies "
    "that selection rule explicitly so both engines return raw stored "
    "values — exact-hashable, unlike interpolated percentile_cont.",
)
def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    n = F.count(F.lit(1)).over(Window.partitionBy("o_orderstatus"))
    rn = F.row_number().over(
        Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    )
    ranked = o.select("o_orderstatus", "o_totalprice", rn.alias("rn"), n.alias("n"))
    return ranked.groupBy("o_orderstatus").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("o_totalprice"))
        ).alias("p50"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("o_totalprice"))
        ).alias("p95"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.99 * F.col("n")), F.col("o_totalprice"))
        ).alias("p99"),
    )
