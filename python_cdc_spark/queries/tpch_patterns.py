"""Adapted TPC-H Q2 / Q11 / Q20 / Q21 pattern queries.

The driver's dataset has no ``partsupp`` table and no ``l_commitdate`` /
``l_receiptdate`` columns (TESTDATA.md), so the four classic queries that
need them cannot run verbatim.  These variants preserve each query's
*operator shape* — the part that exercises the engine — on the columns
that exist:

- Q2  pattern: correlated scalar-min subquery → groupBy-min + equality
  join back (min-cost supplier per part within a region).
- Q11 pattern: group aggregate filtered against a global scalar threshold
  (scalar subquery → broadcast 1-row cross join).
- Q20 pattern: aggregate → threshold join → semi-join chain
  (suppliers shipping an outsized share of a part).
- Q21 pattern: EXISTS + NOT EXISTS self-joins on lineitem
  (sole supplier to blame in multi-supplier orders).

Reference parity: the reference engine is a pgoutput CDC consumer with no
relational surface (SURVEY.md §2.1 "Explicitly absent"); these rows
belong to the E5/E7/E10 mandate.

Scale notes: the pseudo-partsupp aggregate shuffles once on
(l_partkey, l_suppkey) and every later join reuses partkey keys;
nation/region are constant-size → explicit broadcast; the Q21 semi/anti
self-joins are equi-joins on l_orderkey (sort-merge at scale, the
inequality rides along as a join-condition filter, never a cartesian).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.io import table
from python_cdc_spark.queries.helpers import DEC
from python_cdc_spark.queries.registry import register

# Pseudo-partsupp derived from lineitem: the observed min unit price a
# supplier charged for a part. MIN over doubles is order-independent, and
# l_extendedprice / double(l_quantity) is one IEEE division — identical
# on both engines, so the derived "cost" is exactly reproducible.
_SQL_PSEUDO_PS = """
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / CAST(l_quantity AS DOUBLE)) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _pseudo_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice") / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_SQL_PSEUDO_PS}),
    regional AS (
      SELECT ps.l_partkey, ps.unit_cost, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    mins AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost
      FROM regional GROUP BY l_partkey
    )
    SELECT g.s_acctbal, g.s_name, g.n_name,
           p.p_partkey, p.p_name, g.unit_cost
    FROM regional g
    JOIN mins m ON m.l_partkey = g.l_partkey AND g.unit_cost = m.min_cost
    JOIN part p ON p.p_partkey = g.l_partkey
    WHERE p.p_type = 'PROMO'
    ORDER BY g.s_acctbal DESC, g.n_name, g.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 pattern: min-cost supplier per part in a region "
    "(correlated scalar-min subquery as groupBy-min + equality join back)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _pseudo_partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    regional = (
        ps.join(s, ps["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    mins = (
        regional.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "m_partkey")
    )
    return (
        regional.join(
            mins,
            (regional["l_partkey"] == mins["m_partkey"])
            & (regional["unit_cost"] == mins["min_cost"]),
        )
        .join(p, regional["l_partkey"] == p["p_partkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH supp_nation AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
    ),
    val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS v
      FROM lineitem JOIN supp_nation ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    ),
    total AS (SELECT SUM(v) AS t FROM val)
    SELECT l_partkey AS p_partkey,
           CAST(ROUND(v, 4) AS DOUBLE) AS part_value
    FROM val CROSS JOIN total
    WHERE CAST(v AS DOUBLE) > CAST(t AS DOUBLE) * 0.001
    ORDER BY part_value DESC, p_partkey
    """,
    doc="TPC-H Q11 pattern: parts whose single-nation revenue exceeds a "
    "global-threshold scalar subquery (broadcast 1-row cross join, "
    "decimal-exact sums compared in double)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = s.join(broadcast(n), F.col("n_nationkey") == F.col("s_nationkey")).select(
        "s_suppkey"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    val = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("v"))
    )
    total = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("t").cast("double") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v"), 4).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q20_outsized_share_suppliers",
    oracle="""
    WITH sq AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(30,10))) AS supp_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    pq AS (
      SELECT l_partkey,
             SUM(supp_qty) AS part_qty,
             COUNT(*) AS n_suppliers
      FROM sq GROUP BY l_partkey
    ),
    qualifying AS (
      SELECT sq.l_suppkey
      FROM sq
      JOIN pq USING (l_partkey)
      JOIN part p ON p.p_partkey = sq.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND pq.n_suppliers >= 2
        AND CAST(sq.supp_qty AS DOUBLE)
              > 1.5 * CAST(pq.part_qty AS DOUBLE) / pq.n_suppliers
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qualifying)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 pattern: suppliers shipping >1.5x the per-supplier "
    "average quantity of a 'red' part (agg -> threshold join -> "
    "semi-join chain)",
)
def q20_outsized_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("supp_qty")
    )
    pq = sq.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    qualifying = (
        sq.join(pq, "l_partkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (F.col("n_suppliers") >= 2)
            & (
                F.col("supp_qty").cast("double")
                > 1.5 * F.col("part_qty").cast("double") / F.col("n_suppliers")
            )
        )
        .select("l_suppkey")
    )
    return (
        s.join(qualifying, s["s_suppkey"] == qualifying["l_suppkey"], "left_semi")
        .join(broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_sole_blame_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 pattern: sole supplier with a returned line in a "
    "multi-supplier finalized order (EXISTS semi-join + NOT EXISTS "
    "anti-join on lineitem, equi-keyed on l_orderkey)",
)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waited = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        waited.join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
        .join(s, F.col("l1.l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
