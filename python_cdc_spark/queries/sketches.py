"""Mergeable sketches from first principles (SURVEY.md §2.2 E11 — the
approximate-aggregation family, implemented as Catalyst plans).

``approx_distinct_users`` already exercises Spark's builtin HLL++ (its
raw estimate is engine-specific, so its oracle gates a tolerance boolean).
These queries are the complementary, stronger statement: the sketch
itself — hash, registers, estimator — built from deterministic integer
arithmetic that BOTH engines replay bit-for-bit, so the driver's strict
value hash covers the estimate, not just a tolerance band.

Why this matters at 100 TB: COUNT(DISTINCT) and exact heavy-hitters need
a full shuffle of the key universe; register/counter sketches are
*mergeable partial aggregates* — each executor folds its partition into
an O(m) state, and the combine is an elementwise max (HLL) or sum (CM).
That is exactly the map-side-combine shape Spark's hash aggregate
already gives a ``groupBy(bucket).max/ sum`` plan, so the sketch costs
one scan + an O(m)-row exchange regardless of data volume.

Cross-engine determinism rules used here:
- Hashing is a 32-bit multiply-xor-shift mix (Thomas Mueller's public
  ``hash32`` construction) with multiplier 0x45d9f3b: every intermediate
  stays below 2^59, so BIGINT arithmetic never overflows on either
  engine (Spark runs ANSI mode; overflow would throw, not wrap).
- rho (leading-zero rank) is derived from ``length(bin(w))`` — integer
  string length, never ``log2`` (libm log2 can disagree in the last ulp
  across engines at exact powers of two).
- 2^-rho terms are ``1.0 / (1 << rho)`` — exact dyadic doubles; their
  sum is a multiple of 2^-25 bounded by m, hence exact in double in ANY
  accumulation order. No decimal routing needed.
- The estimator's alpha is written as the same arithmetic expression in
  both dialects (0.7213 / (1 + 1.079/m)), so both engines evaluate the
  identical IEEE sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.queries.registry import register

# 2^32; all hashes live in [0, 2^32).
_M32 = 4294967296
# Mueller hash32 multiplier (public domain construction).
_MULT = 0x45D9F3B
# Golden-ratio odd constant for per-row seed offsets (Knuth).
_GOLD = 2654435769


def _mix32(col: Column) -> Column:
    """Deterministic 32-bit integer mix of a non-negative bigint."""
    x = col % F.lit(_M32)
    a = (F.shiftright(x, 16).bitwiseXOR(x) * F.lit(_MULT)) % F.lit(_M32)
    b = (F.shiftright(a, 16).bitwiseXOR(a) * F.lit(_MULT)) % F.lit(_M32)
    return F.shiftright(b, 16).bitwiseXOR(b)


def _sql_mix32(expr: str) -> str:
    """The same mix as a DuckDB scalar expression (via nested CTE-less
    subexpressions; callers interpolate into their oracle SQL)."""
    x = f"(({expr}) % 4294967296)"
    a = f"((xor(({x} >> 16), {x}) * {_MULT}) % 4294967296)"
    b = f"((xor(({a} >> 16), {a}) * {_MULT}) % 4294967296)"
    return f"xor(({b} >> 16), {b})"


@register(
    "sketch_hll_orderkeys",
    oracle=f"""
    WITH h AS (
      SELECT {_sql_mix32("l_orderkey")} AS h FROM lineitem
    ),
    reg AS (
      SELECT h % 256 AS bucket,
             MAX(CASE WHEN (h >> 8) = 0 THEN 25
                      ELSE 25 - length(bin(h >> 8)) END) AS r
      FROM h GROUP BY 1
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS buckets_used,
             SUM(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << r)) AS s_obs
      FROM reg
    ),
    ex AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orderkeys
      FROM lineitem
    )
    SELECT CAST(256 AS INTEGER) AS m,
           buckets_used,
           (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
             / (s_obs + (256.0 - buckets_used)) AS hll_estimate,
           exact_orderkeys,
           ABS((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                 / (s_obs + (256.0 - buckets_used))
               / CAST(exact_orderkeys AS DOUBLE) - 1.0) AS rel_err
    FROM agg CROSS JOIN ex
    """,
    doc="E11: HyperLogLog from first principles — deterministic mix32 "
    "hash, m=256 registers via groupBy-max (a mergeable partial "
    "aggregate), raw estimator replayed bit-for-bit by the oracle; "
    "exact count and relative error reported alongside",
)
def sketch_hll_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l_orderkey in lineitem (~4 rows/key — genuine
    duplication) estimated by a from-scratch HLL: bucket = h mod m,
    rho = leading-zero rank of the remaining 24 bits (via bin-string
    length, never log2), register = max(rho) per bucket, raw estimate
    alpha_m * m^2 / sum(2^-register) with absent buckets contributing
    2^0. n/m ~ 58 at sf0.01 keeps the raw estimator in its design range
    (no small-range correction branch, which would need ln()).

    The register table IS the mergeable sketch: executors fold
    partitions map-side, the exchange carries <= m rows, and unioning
    two corpora is an elementwise max — the 100 TB COUNT(DISTINCT)
    shape. The exact count (one extra distinct agg) is reported for the
    rel_err column; a production caller would drop it."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    h = li.select(_mix32(F.col("l_orderkey")).alias("h"))
    w = F.shiftright(F.col("h"), 8)
    reg = (
        h.select(
            (F.col("h") % 256).alias("bucket"),
            F.when(w == 0, F.lit(25)).otherwise(
                F.lit(25) - F.length(F.bin(w))
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    agg = reg.agg(
        F.count(F.lit(1)).cast("long").alias("buckets_used"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), r)")
        ).alias("s_obs"),
    )
    ex = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_orderkeys")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
    est = alpha * F.lit(256.0) * F.lit(256.0) / (
        F.col("s_obs") + (F.lit(256.0) - F.col("buckets_used"))
    )
    return (
        agg.crossJoin(ex)  # 1 row x 1 row
        .select(
            F.lit(256).alias("m"),
            "buckets_used",
            est.alias("hll_estimate"),
            "exact_orderkeys",
            F.abs(
                est / F.col("exact_orderkeys").cast("double") - F.lit(1.0)
            ).alias("rel_err"),
        )
    )


@register(
    "sketch_countmin_partkeys",
    oracle=f"""
    WITH rows_h AS (
      SELECT s.i AS i,
             {_sql_mix32("(l_partkey + s.i * " + str(_GOLD) + ")")} % 1024
               AS bucket
      FROM lineitem
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS s(i)
    ),
    counters AS (
      SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM rows_h GROUP BY 1, 2
    ),
    top20 AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM lineitem GROUP BY 1
      ORDER BY exact_n DESC, l_partkey LIMIT 20
    ),
    probes AS (
      SELECT t.l_partkey, t.exact_n, s.i AS i,
             {_sql_mix32("(t.l_partkey + s.i * " + str(_GOLD) + ")")} % 1024
               AS bucket
      FROM top20 t CROSS JOIN (VALUES (0), (1), (2), (3)) AS s(i)
    )
    SELECT p.l_partkey, p.exact_n,
           CAST(MIN(c.cnt) AS BIGINT) AS cm_estimate,
           CAST(MIN(c.cnt) - p.exact_n AS BIGINT) AS overcount
    FROM probes p JOIN counters c ON p.i = c.i AND p.bucket = c.bucket
    GROUP BY p.l_partkey, p.exact_n
    """,
    doc="E11: count-min sketch (d=4 rows x w=1024) over lineitem part "
    "frequencies — seeded mix32 bucket per row, counters via one-scan "
    "explode + hash aggregate (mergeable by elementwise sum), top-20 "
    "exact heavy hitters probed for their min-over-rows estimate; "
    "overcount column shows the collision bias CM is allowed",
)
def sketch_countmin_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency sketch: 2000 distinct partkeys hashed into 1024-wide
    counter rows force real collisions, so the min-over-d estimate
    visibly overcounts some keys — the honest CM trade (est >= exact,
    bounded by eps*N with prob 1-delta). The counter build is ONE scan:
    each row explodes into its d (row, bucket) cells and a single hash
    aggregate folds them map-side; the sketch state is d*w = 4096
    cells regardless of input volume, and two sketches merge by cell
    sum — the partial-aggregable heavy-hitter shape for 100 TB streams.
    Probing joins the 20-row candidate table (broadcast) against the
    4096-row counter table — metadata-scale."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    cells = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            _mix32(F.col("l_partkey") + F.lit(i * _GOLD))
                            % 1024
                        ).alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cell")
    ).select("cell.i", "cell.bucket")
    counters = cells.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    top20 = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "l_partkey")
        .limit(20)
    )
    probes = top20.select(
        "l_partkey",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            _mix32(F.col("l_partkey") + F.lit(i * _GOLD))
                            % 1024
                        ).alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cell"),
    ).select("l_partkey", "exact_n", "cell.i", "cell.bucket")
    est = (
        F.broadcast(probes)
        .join(counters, ["i", "bucket"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("cnt").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "l_partkey",
        "exact_n",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_n")).cast("long").alias(
            "overcount"
        ),
    )


@register(
    "sketch_kmv_returnflag_overlap",
    oracle=f"""
    WITH da AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    db AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    ),
    ha AS (SELECT l_orderkey, {_sql_mix32("l_orderkey")} AS h FROM da),
    hb AS (SELECT l_orderkey, {_sql_mix32("l_orderkey")} AS h FROM db),
    ska AS (SELECT * FROM ha ORDER BY h, l_orderkey LIMIT 256),
    skb AS (SELECT * FROM hb ORDER BY h, l_orderkey LIMIT 256),
    sku AS (
      SELECT DISTINCT l_orderkey, h
      FROM (SELECT * FROM ska UNION ALL SELECT * FROM skb)
      ORDER BY h, l_orderkey LIMIT 256
    ),
    nb AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM sku
      WHERE l_orderkey IN (SELECT l_orderkey FROM ska)
        AND l_orderkey IN (SELECT l_orderkey FROM skb)
    ),
    kth AS (
      SELECT (SELECT MAX(h) FROM ska) AS kth_a,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ska) AS n_a,
             (SELECT MAX(h) FROM skb) AS kth_b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM skb) AS n_b,
             (SELECT MAX(h) FROM sku) AS kth_u,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sku) AS n_u
    ),
    ex AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM da) AS exact_a,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM db) AS exact_b,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM da JOIN db USING (l_orderkey)) AS exact_intersection
    ),
    est AS (
      SELECT CASE WHEN n_a < 256 THEN CAST(n_a AS DOUBLE)
                  ELSE CAST(255 AS DOUBLE) * 4294967296.0 / kth_a END AS est_a,
             CASE WHEN n_b < 256 THEN CAST(n_b AS DOUBLE)
                  ELSE CAST(255 AS DOUBLE) * 4294967296.0 / kth_b END AS est_b,
             CASE WHEN n_u < 256 THEN CAST(n_u AS DOUBLE)
                  ELSE CAST(255 AS DOUBLE) * 4294967296.0 / kth_u END AS est_u,
             CAST(n_both AS DOUBLE)
               / (CASE WHEN n_u < 256 THEN n_u ELSE 256 END) AS jaccard_est
      FROM kth CROSS JOIN nb
    )
    SELECT CAST(256 AS INTEGER) AS k,
           est_a, est_b, est_u AS est_union, jaccard_est,
           jaccard_est * est_u AS est_intersection,
           exact_a, exact_b, exact_intersection,
           CAST(exact_intersection AS DOUBLE)
             / (exact_a + exact_b - exact_intersection) AS jaccard_exact
    FROM est CROSS JOIN ex
    """,
    doc="E11/E15: KMV (k-minimum-values) sketches with SET ALGEBRA — "
    "k=256 smallest deterministic hashes per orderkey set ('R' vs 'A' "
    "returnflag), union sketch composed FROM the two sketches (k-min of "
    "a union is the k-min of the sketch union), intersection/Jaccard "
    "estimated from sketch membership; exact values alongside",
)
def sketch_kmv_returnflag_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set OPERATIONS on sketches — the capability HLL alone
    lacks: two KMV sketches estimate |A|, |B|, |A∪B|, |A∩B| and
    Jaccard without revisiting the data. Each per-set sketch is an
    ORDER BY hash LIMIT k — Spark plans TakeOrderedAndProject (per-
    partition top-k, k-row merge; never a global sort), so sketch
    construction scales to arbitrarily large sets. All downstream
    algebra runs on <= 3k rows: the union sketch is the k smallest of
    the two sketches' union (an exact KMV identity), and x ∈ A∩B is
    tested by membership in BOTH k-row sketches. Estimators are
    (k-1)·2^32 / kth_min and J = |union-sketch ∩ both| / k, with the
    standard SMALL-SET GUARD on both engines: a sketch holding fewer
    than k rows IS the exact distinct set, so its estimate (and the
    Jaccard denominator) switches to the exact row count instead of
    silently misestimating small sets (guard path pinned by
    tests/test_sketches.py on a 30-row fixture). Every value is integer
    arithmetic plus one double division, so both engines agree
    bit-for-bit. Ties between equal hashes are broken by orderkey —
    32-bit collisions (~2.6% at sf0.01) would otherwise make the k-th
    row engine-dependent."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")

    # each distinct set and each k-row sketch is consumed ~3 times
    # downstream (union sketch, membership, kth/count stats, exact
    # companions) — checkpoint them so lineitem is scanned once per
    # set, not once per consumer (was ~10 scans; the checkpointed
    # sketches are 256 rows, the sets |distinct| rows)
    def dset(flag: str) -> DataFrame:
        return (
            li.filter(F.col("l_returnflag") == flag)
            .select("l_orderkey")
            .distinct()
            .localCheckpoint(eager=False)
        )

    def sketch(d: DataFrame) -> DataFrame:
        return (
            d.select("l_orderkey", _mix32(F.col("l_orderkey")).alias("h"))
            .orderBy("h", "l_orderkey")
            .limit(256)
            .localCheckpoint(eager=False)
        )

    da, db = dset("R"), dset("A")
    ska, skb = sketch(da), sketch(db)
    sku = (
        ska.unionAll(skb)
        .dropDuplicates(["l_orderkey", "h"])
        .orderBy("h", "l_orderkey")
        .limit(256)
        .localCheckpoint(eager=False)
    )
    n_both = (
        sku.join(ska.select("l_orderkey"), "l_orderkey", "semi")
        .join(skb.select("l_orderkey"), "l_orderkey", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    kth = (
        ska.agg(
            F.max("h").alias("kth_a"),
            F.count(F.lit(1)).cast("long").alias("n_a"),
        )
        .crossJoin(
            skb.agg(
                F.max("h").alias("kth_b"),
                F.count(F.lit(1)).cast("long").alias("n_b"),
            )
        )
        .crossJoin(
            sku.agg(
                F.max("h").alias("kth_u"),
                F.count(F.lit(1)).cast("long").alias("n_u"),
            )
        )
    )
    ex = (
        da.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(db.agg(F.count(F.lit(1)).cast("long").alias("exact_b")))
        .crossJoin(
            da.join(db, "l_orderkey")
            .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
        )
    )
    # small-set guard: a sketch with < k rows IS the exact distinct set
    def est(kth_col: str, n_col: str):
        return F.when(
            F.col(n_col) < 256, F.col(n_col).cast("double")
        ).otherwise(F.lit(255.0) * F.lit(4294967296.0) / F.col(kth_col))

    jac = F.col("n_both").cast("double") / F.when(
        F.col("n_u") < 256, F.col("n_u")
    ).otherwise(F.lit(256))
    return (
        kth.crossJoin(n_both)
        .crossJoin(ex)  # all sides are 1-row
        .select(
            F.lit(256).alias("k"),
            est("kth_a", "n_a").alias("est_a"),
            est("kth_b", "n_b").alias("est_b"),
            est("kth_u", "n_u").alias("est_union"),
            jac.alias("jaccard_est"),
            (jac * est("kth_u", "n_u")).alias("est_intersection"),
            "exact_a",
            "exact_b",
            "exact_intersection",
            (
                F.col("exact_intersection").cast("double")
                / (
                    F.col("exact_a")
                    + F.col("exact_b")
                    - F.col("exact_intersection")
                )
            ).alias("jaccard_exact"),
        )
    )


@register(
    "sketch_hll_groupwise",
    oracle=f"""
    WITH h AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
             l_orderkey,
             {_sql_mix32("l_orderkey")} AS h
      FROM lineitem
    ),
    reg AS (
      SELECT ship_month, h % 32 AS bucket,
             MAX(CASE WHEN (h >> 5) = 0 THEN 28
                      ELSE 28 - length(bin(h >> 5)) END) AS r
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT ship_month,
             CAST(COUNT(*) AS BIGINT) AS b_used,
             SUM(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << r)) AS s_obs
      FROM reg GROUP BY 1
    ),
    ex AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
      FROM lineitem GROUP BY 1
    )
    SELECT agg.ship_month,
           (0.7213 / (1.0 + 1.079 / 32.0)) * 32.0 * 32.0
             / (s_obs + (32.0 - b_used)) AS hll_estimate,
           exact_orders,
           ABS((0.7213 / (1.0 + 1.079 / 32.0)) * 32.0 * 32.0
                 / (s_obs + (32.0 - b_used))
               / CAST(exact_orders AS DOUBLE) - 1.0) AS rel_err
    FROM agg JOIN ex ON agg.ship_month = ex.ship_month
    """,
    doc="E11: GROUP-WISE HLL — distinct orders per ship month with one "
    "m=32 sketch per group, registers via groupBy((group,bucket)).max; "
    "the sketch-as-aggregation-state shape (O(groups*m) rows total), "
    "estimator replayed exactly by the oracle",
)
def sketch_hll_groupwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches as PER-GROUP aggregation state: one HLL per ship month
    (83 groups x m=32 registers), built by a single
    ``groupBy(month, bucket).max(rho)`` — partial aggregation bounds
    the exchange at groups*m rows no matter how many lineitems feed
    it, and each group's registers merge across corpora by elementwise
    max. n/m ~ 21 per group at sf0.01 keeps the raw estimator in range.
    The month spine reuses the same determinism rules as
    ``sketch_hll_orderkeys`` (bin-length rho, dyadic 2^-r sum, shared
    alpha expression); DuckDB's date_trunc returns DATE where Spark
    returns TIMESTAMP, so the oracle casts the group key."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    h = li.select(
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        "l_orderkey",
        _mix32(F.col("l_orderkey")).alias("h"),
    )
    w = F.shiftright(F.col("h"), 5)
    reg = (
        h.select(
            "ship_month",
            (F.col("h") % 32).alias("bucket"),
            F.when(w == 0, F.lit(28)).otherwise(
                F.lit(28) - F.length(F.bin(w))
            ).alias("rho"),
        )
        .groupBy("ship_month", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    agg = reg.groupBy("ship_month").agg(
        F.count(F.lit(1)).cast("long").alias("b_used"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), r)")
        ).alias("s_obs"),
    )
    ex = h.groupBy("ship_month").agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_orders")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(32.0))
    est = alpha * F.lit(32.0) * F.lit(32.0) / (
        F.col("s_obs") + (F.lit(32.0) - F.col("b_used"))
    )
    return agg.join(ex, "ship_month").select(
        "ship_month",
        est.alias("hll_estimate"),
        "exact_orders",
        F.abs(
            est / F.col("exact_orders").cast("double") - F.lit(1.0)
        ).alias("rel_err"),
    )


@register(
    "sketch_kll_quantiles",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey * 8 + l_linenumber AS rid, l_extendedprice AS v
      FROM lineitem
    ),
    hb AS (SELECT rid, v, {_sql_mix32("rid")} % 64 AS bucket FROM li),
    bs AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b FROM hb GROUP BY 1),
    bt AS (
      SELECT bucket, n_b,
             CASE WHEN q = 1 THEN 0 ELSE length(bin(q - 1)) END AS t
      FROM (SELECT bucket, n_b, (n_b + 255) // 256 AS q FROM bs)
    ),
    rn AS (
      SELECT h.v, h.rid, h.bucket,
             ROW_NUMBER() OVER (PARTITION BY h.bucket ORDER BY h.v, h.rid)
               - 1 AS rn,
             b.t
      FROM hb h JOIN bt b USING (bucket)
    ),
    surv AS (
      SELECT v, rid, (CAST(1 AS BIGINT) << t) AS w
      FROM rn WHERE rn % (CAST(1 AS BIGINT) << t) = 0
    ),
    cw AS (
      SELECT v, rid, w,
             SUM(w) OVER (ORDER BY v, rid ROWS UNBOUNDED PRECEDING) AS cw
      FROM surv
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS W FROM surv),
    nr AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n_rows FROM bs),
    dec AS (
      SELECT CAST(d AS INTEGER) AS decile,
             CAST((d * W + 9) // 10 AS BIGINT) AS target_rank
      FROM range(1, 10) t(d) CROSS JOIN tot
    ),
    picked AS (
      SELECT d.decile, d.target_rank, c.v AS kll_value, c.rid AS krid
      FROM dec d JOIN cw c
        ON c.cw >= d.target_rank AND (c.cw - c.w) < d.target_rank
    )
    SELECT decile, kll_value, target_rank, n_rows
    FROM picked CROSS JOIN nr
    """,
    doc="E11: mergeable KLL-style quantile sketch with a DETERMINISTIC "
    "compaction schedule — per-bucket sorted buffers, even-index "
    "survivor rule at a depth fixed by the bucket's count, weighted "
    "global rank estimator; both engines replay the identical "
    "compaction, so the strict value hash covers the estimates (the "
    "open problem from NOTES_r5 priorities #4, closed by FIXING the "
    "schedule instead of replaying a data-dependent one). PRODUCTION "
    "variant (r10, verdict #3): one sketch scan, no rank-verify second "
    "scan — the exact-rank quality check lives in "
    "kll_quantiles_with_rank_verify, pinned by "
    "tests/test_sketches.py::test_kll_rank_error_within_bound",
)
def sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deciles of l_extendedprice from a quantile SKETCH — the
    production shape: ONE scan builds the per-bucket compacted
    survivors; everything after runs on sketch-scale rows.

    Construction (history-independent, hence exactly replayable): rows
    hash into B=64 buckets by mix32(rowid); a bucket holding n_b rows
    compacts its (value, rowid)-sorted buffer in one shot to depth
    t = ceil(log2(ceil(n_b/k))) (k=256) by keeping every 2^t-th element
    (the even-index survivor rule applied t times collapses to exactly
    this), each surviving with weight 2^t. ceil-log2 is integer bit
    length (``length(bin(q-1))``) — never libm log2. The estimate for
    quantile q is the first survivor whose running weight reaches
    ceil(q*W) in global (value, rowid) order.

    Scale shape: the per-bucket sort is a partition-local sort (B scales
    with the cluster at 100 TB; it is a fixed sketch parameter here the
    way m=256 is for the HLL); survivors are <= B*k rows — the global
    weighted-rank step runs on sketch-scale data, never on the fact
    table. Rank error is bounded by the strata gaps: |exact - target|
    <= sum_b 2^(t_b), about 0.5% of n at these scales (asserted in
    tests/test_sketches.py against kll_quantiles_with_rank_verify,
    which adds the exact-rank second scan this production variant
    deliberately drops)."""
    li, picked, nr = _kll_decile_sketch(spark, sf_dir)
    return picked.crossJoin(F.broadcast(nr)).select(
        "decile", "kll_value", "target_rank", "n_rows"
    )


def kll_quantiles_with_rank_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate variant: the production sketch PLUS the true rank of
    each estimate (a broadcast 9-row theta join driving one extra fact
    scan). This is deliberately NOT the registered query — the verify
    scan is diagnostics, not the operator (r10 verdict #3) — but the
    rank-error bound it measures is pinned every run by
    tests/test_sketches.py::test_kll_rank_error_within_bound."""
    li, picked, nr = _kll_decile_sketch(spark, sf_dir)
    ranks = (
        F.broadcast(picked)
        .join(
            li,
            (li["v"] < F.col("kll_value"))
            | ((li["v"] == F.col("kll_value")) & (li["rid"] <= F.col("krid"))),
        )
        .groupBy("decile", "target_rank", "kll_value")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_rank"))
    )
    return ranks.crossJoin(F.broadcast(nr)).select(
        "decile", "kll_value", "target_rank", "exact_rank", "n_rows"
    )


def _kll_decile_sketch(spark: SparkSession, sf_dir: str):
    """Shared KLL pipeline: returns (fact rows, picked decile survivors
    with krid, n_rows one-row frame)."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
        F.col("l_extendedprice").alias("v"),
    )
    hb = li.withColumn("bucket", _mix32(F.col("rid")) % 64)
    # bucket counts feed the depth table (a broadcast) AND n_rows; the
    # survivor set feeds the running-weight path AND the total-weight
    # broadcast. Without checkpoints each broadcast build re-ran the
    # fact aggregation / the full per-bucket fact SORT from scratch
    # (r13: one fact sort and one fact agg per invocation, not two).
    bs = (
        hb.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
        .localCheckpoint(eager=False)
    )
    bt = bs.withColumn("q", F.expr("(n_b + 255) div 256")).select(
        "bucket",
        "n_b",
        F.when(F.col("q") == 1, F.lit(0))
        .otherwise(F.length(F.bin(F.col("q") - 1)))
        .cast("int")
        .alias("t"),
    )
    wb = Window.partitionBy("bucket").orderBy("v", "rid")
    rn = hb.withColumn("rn", F.row_number().over(wb) - 1).join(
        F.broadcast(bt), "bucket"
    )
    pow2t = F.expr("shiftleft(cast(1 as bigint), t)")
    surv = (
        rn.filter((F.col("rn") % pow2t) == 0)
        .select("v", "rid", pow2t.alias("w"))
        .localCheckpoint(eager=False)  # <= B*k sketch rows
    )
    # survivors are <= B*k rows: the unpartitioned window is sketch-scale
    wg = Window.orderBy("v", "rid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cw = surv.withColumn("cw", F.sum("w").over(wg))
    tot = surv.agg(F.sum("w").cast("long").alias("W"))
    nr = bs.agg(F.sum("n_b").cast("long").alias("n_rows"))
    dec = (
        spark.range(1, 10)
        .select(F.col("id").cast("int").alias("decile"))
        .crossJoin(F.broadcast(tot))  # 9 x 1 rows
        .select(
            "decile",
            F.expr("cast((decile * W + 9) div 10 as bigint)").alias(
                "target_rank"
            ),
        )
    )
    picked = F.broadcast(dec).join(
        cw,
        (F.col("cw") >= F.col("target_rank"))
        & ((F.col("cw") - F.col("w")) < F.col("target_rank")),
    ).select(
        "decile",
        "target_rank",
        F.col("v").alias("kll_value"),
        F.col("rid").alias("krid"),
    )
    return li, picked, nr


_BLOOM_M = 65536  # bits (2048 x 32-bit words packed in BIGINTs)
_BLOOM_K = 3      # hash functions (mix32 with golden-ratio salts)


def _sql_bloom_pos(key_expr: str, i_expr: str) -> str:
    """Bit position of hash i for a key — shared by build and probe."""
    return f"({_sql_mix32(f'(({key_expr}) + ({i_expr}) * {_GOLD})')} % {_BLOOM_M})"


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH ks AS (SELECT UNNEST([{", ".join(map(str, range(_BLOOM_K)))}]) AS i),
    mem AS (SELECT DISTINCT c_custkey AS k FROM customer),
    bloom AS (
      SELECT CAST(p >> 5 AS BIGINT) AS widx,
             bit_or(CAST(1 AS BIGINT) << CAST(p & 31 AS INTEGER)) AS w
      FROM (SELECT {_sql_bloom_pos("m.k", "ks.i")} AS p FROM mem m, ks)
      GROUP BY 1
    ),
    probes AS (
      SELECT 'member' AS band, o_custkey AS k
      FROM (SELECT DISTINCT o_custkey FROM orders)
      UNION ALL
      SELECT 'nonmember' AS band, o_custkey + 1000000000 AS k
      FROM (SELECT DISTINCT o_custkey FROM orders)
    ),
    checks AS (
      SELECT band, k,
             MIN(CASE WHEN (b.w & (CAST(1 AS BIGINT)
                                   << CAST(pp.p & 31 AS INTEGER))) <> 0
                      THEN 1 ELSE 0 END) AS hit
      FROM (SELECT band, k, {_sql_bloom_pos("p0.k", "ks.i")} AS p
            FROM probes p0, ks) pp
      LEFT JOIN bloom b ON (pp.p >> 5) = b.widx
      GROUP BY band, k
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(hit) AS BIGINT) AS n_hits,
           CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS hit_rate
    FROM checks GROUP BY band
    """,
    doc=f"E11: Bloom membership sketch from first principles — "
    f"m={_BLOOM_M} bits as 32-bit words in BIGINTs, k={_BLOOM_K} mix32 "
    f"hashes; built over customer keys, probed with order custkeys "
    f"(members, hit rate exactly 1.0) and shifted non-members (the "
    f"measured false-positive rate); bit-exact in both engines",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The membership sketch completing the mergeable family (HLL
    count-distinct, CM frequency, KMV overlap, KLL quantiles, Bloom
    membership). Scale shape: the filter is a bit_or-mergeable O(m/32)
    state — each executor folds its partition's keys into word partials
    and the combine is elementwise OR (the same map-side-combine shape
    as the HLL registers); probing broadcasts the 2048-word table and
    stays map-side. The 100 TB uses: pre-filtering a CDC delta's keys
    against a table's key universe before an expensive anti-join, and
    file-level membership pruning where exact indexes don't fit. The
    false-positive band is the honest part of the gate: the oracle
    replays the identical bit math, so the measured fp rate (not a
    formula) must hash-match."""
    i = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("i")

    def positions(df, key_col):
        return df.select(
            "*", i
        ).select(
            "*",
            (_mix32(F.col(key_col) + F.col("i") * F.lit(_GOLD)) % _BLOOM_M).alias("p"),
        )

    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k")
    ).distinct()
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 31 AS INT))")
    bloom = (
        positions(cust, "k")
        .select(
            F.shiftright("p", 5).cast("long").alias("widx"),
            bit.alias("bv"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bv").alias("w"))
    )

    ok = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    ).distinct()
    probes = ok.select(F.lit("member").alias("band"), "k").unionAll(
        ok.select(F.lit("nonmember").alias("band"), (F.col("k") + F.lit(1000000000)).alias("k"))
    )
    checks = (
        positions(probes, "k")
        .withColumn("widx", F.shiftright("p", 5).cast("long"))
        .join(F.broadcast(bloom), "widx", "left")
        .select(
            "band",
            "k",
            F.when(F.col("w").bitwiseAND(bit) != 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("hit"),
        )
        .groupBy("band", "k")
        .agg(F.min("hit").alias("hit"))
    )
    return checks.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("hit").cast("long").alias("n_hits"),
        (
            F.sum("hit").cast("long").cast("double")
            / F.count(F.lit(1)).cast("long").cast("double")
        ).alias("hit_rate"),
    )


# ---------------------------------------------------------------------------
# Bloom delta-key pruning — the 100 TB use-case of the membership sketch
# ---------------------------------------------------------------------------
# A CDC delta touches a small key set; incremental maintenance wants the
# base-table rows whose keys the delta did NOT touch to skip the exact
# (anti-)join entirely. The bloom gives a no-false-negative pre-filter:
# a miss is PROOF the row is untouched, so only bloom-hit survivors
# (touched + a measured false-positive band) ever reach the exact join.
# Sized for delta-scale membership (2^20 bits), not the 2^16-bit demo
# filter above: at a 10x-scaled delta (~130k keys) the load stays
# ~0.4 bit/key-hash and the measured fp band stays in low percent.
_PB_M = 1 << 20   # bits (32768 x 32-bit words)
_PB_K = 3         # hash functions


def _sql_pb_pos(key_expr: str, i: int) -> str:
    return f"({_sql_mix32(f'(({key_expr}) + {i * _GOLD})')} % {_PB_M})"


# Every _PB_K-dependent oracle fragment is GENERATED from _PB_K so the
# two engines cannot desync if the hash count changes (ADVICE r9: the
# UNNEST list — and the probe columns/joins beside it — were literals).
_PB_UNNEST = ", ".join(map(str, range(_PB_K)))
_PB_BASE_COLS = ",\n             ".join(
    f'{_sql_pb_pos("l_orderkey", j)} AS p{j}' for j in range(_PB_K)
)
_PB_HIT_COND = "\n                   AND ".join(
    f"b{j}.w IS NOT NULL\n"
    f"                   AND (b{j}.w & (CAST(1 AS BIGINT)\n"
    f"                                << CAST(base.p{j} & 31 AS INTEGER))) <> 0"
    for j in range(_PB_K)
)
_PB_JOINS = "\n      ".join(
    f"LEFT JOIN bloom b{j} ON CAST(base.p{j} >> 5 AS BIGINT) = b{j}.widx"
    for j in range(_PB_K)
)


@register(
    "cdc_bloom_delta_prune",
    oracle=f"""
    WITH ks AS (SELECT UNNEST([{_PB_UNNEST}]) AS i),
    delta AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    ),
    bloom AS (
      SELECT CAST(p >> 5 AS BIGINT) AS widx,
             bit_or(CAST(1 AS BIGINT) << CAST(p & 31 AS INTEGER)) AS w
      FROM (SELECT ({_sql_mix32(f"(d.k + ks.i * {_GOLD})")} % {_PB_M}) AS p
            FROM delta d, ks)
      GROUP BY 1
    ),
    base AS (
      SELECT l_orderkey AS k,
             {_PB_BASE_COLS}
      FROM lineitem
    ),
    probed AS (
      SELECT base.k,
             CASE WHEN {_PB_HIT_COND}
                  THEN 1 ELSE 0 END AS hit
      FROM base
      {_PB_JOINS}
    ),
    banded AS (
      SELECT CASE WHEN p.hit = 0 THEN 'pruned'
                  WHEN d.k IS NOT NULL THEN 'touched'
                  ELSE 'false_positive' END AS band,
             p.k
      FROM probed p LEFT JOIN delta d ON p.k = d.k
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share_rows
    FROM banded GROUP BY band
    """,
    doc="E11+E18 composition: bloom over a CDC delta's key set pruning a "
    "big base table before the exact join — the pre-filter use the "
    "Bloom sketch exists for. The false-positive band is measured and "
    "hash-matched, not formula-estimated.",
)
def cdc_bloom_delta_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom delta-prune: fold the delta's keys into a 2^20-bit filter
    (bit_or-mergeable word partials, map-side combine), broadcast the
    32768-word table once, and probe every base row MAP-SIDE — the base
    never shuffles. Rows whose probe misses are provably untouched
    ('pruned'); only survivors carry into the exact key join that
    splits 'touched' from the measured 'false_positive' band. At 100 TB
    the survivor set is delta-scale, so the expensive exact join runs
    on ~2% of the base instead of all of it; here the exact join is a
    BHJ against the broadcast delta for the gate's full three-band
    accounting. Shuffles: the O(m/32)-row bloom fold, the 3-row final
    aggregate, and ONE key-scale exchange for the distinct-key count
    (the (band, k) partial aggregate dedups map-side first, so the
    exchange carries distinct keys, not base rows; a caller that only
    needs row accounting drops n_keys and with it the exchange)."""
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    # the delta key set feeds the bloom fold AND the final exact-band
    # broadcast; the bloom word table feeds THREE broadcast builds (one
    # per hash function — their plans differ only by column alias, so
    # ReuseExchange cannot dedup them). Lazy checkpoints make each the
    # product of ONE orders scan / ONE fold instead of one per consumer
    # (r13: 14 -> 9 jobs per invocation, delta scanned once not 4x).
    delta = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
        )
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    i = F.explode(F.array(*[F.lit(j) for j in range(_PB_K)])).alias("i")
    bit_of = lambda p: F.expr(  # noqa: E731 — local bit helper
        f"shiftleft(CAST(1 AS BIGINT), CAST(({p}) & 31 AS INT))"
    )
    bloom = (
        delta.select("k", i)
        .select(
            (_mix32(F.col("k") + F.col("i") * F.lit(_GOLD)) % _PB_M).alias("p")
        )
        .select(
            F.shiftright("p", 5).cast("long").alias("widx"),
            bit_of("p").alias("bv"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bv").alias("w"))
        .localCheckpoint(eager=False)
    )
    base = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("k")
    )
    # probe = three broadcast hash joins against the O(m/32)-row word
    # table (O(1) JVM hash lookups per row) — NOT element_at on a
    # broadcast MapType, which is a linear scan of all 32768 entries
    # per lookup and measured 10x slower at sf0.1
    probed = base.select(
        "k",
        *[
            (_mix32(F.col("k") + F.lit(j * _GOLD)) % _PB_M).alias(f"p{j}")
            for j in range(_PB_K)
        ],
    )
    hit = F.lit(True)
    for j in range(_PB_K):
        bj = bloom.select(
            F.col("widx").alias(f"widx{j}"), F.col("w").alias(f"w{j}")
        )
        probed = probed.join(
            F.broadcast(bj),
            F.shiftright(F.col(f"p{j}"), 5).cast("long") == F.col(f"widx{j}"),
            "left",
        )
        hit = hit & F.coalesce(
            F.col(f"w{j}").bitwiseAND(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(p{j} & 31 AS INT))"
                )
            )
            != 0,
            F.lit(False),
        )
    banded = (
        probed.select("k", hit.alias("hit"))
        .join(
            F.broadcast(delta.select("k", F.lit(1).alias("in_delta"))),
            "k",
            "left",
        )
        .select(
            F.when(~F.col("hit"), F.lit("pruned"))
            .when(F.col("in_delta").isNotNull(), F.lit("touched"))
            .otherwise(F.lit("false_positive"))
            .alias("band"),
            "k",
        )
    )
    counts = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("k").cast("long").alias("n_keys"),
    )
    wall = Window.partitionBy()
    return counts.select(
        "band",
        "n_rows",
        "n_keys",
        (
            F.col("n_rows").cast("double")
            / F.sum("n_rows").over(wall).cast("double")
        ).alias("share_rows"),
    )


@register(
    "sketch_heavyhitters_exact",
    oracle="""
    WITH t AS (SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
               FROM documents),
    tok AS (SELECT UNNEST(w) AS token FROM t),
    n AS (SELECT COUNT(*) AS n FROM tok),
    freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token),
    hh AS (SELECT token, freq FROM freq, n WHERE freq * 500 >= n.n)
    SELECT token, freq,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rnk
    FROM hh
    """,
    doc="E11: EXACT heavy hitters (freq ≥ N/500 tokens) via two passes "
    "— map-side Misra-Gries candidate summaries (zero shuffle), then an "
    "exact broadcast-semi-join recount of candidates only; equals a "
    "full groupBy + HAVING without shuffling the vocabulary",
)
def sketch_heavyhitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items member of the sketch family (E11): every token
    with frequency ≥ N/500, with EXACT counts. Pass 1 runs a
    capacity-512 Misra-Gries summary per partition inside one Arrow
    ``mapInPandas`` (vectorized value_counts per batch; undercount ≤
    N_part/513, so every global heavy hitter survives into the
    candidate union — capacity+1 > inv_phi is asserted). Pass 2
    broadcast-semi-joins the candidates and recounts exactly, so the
    oracle is a plain GROUP BY + HAVING. At 100 TB: pass 1 shuffles
    nothing, pass 2 shuffles only candidate keys (≤ partitions × 512),
    never the vocabulary (operators/heavy_hitters.py)."""
    from pyspark.sql import Window

    from python_cdc_spark.functions.text import tokens
    from python_cdc_spark.operators.heavy_hitters import exact_heavy_hitters

    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    hh = exact_heavy_hitters(tok, "token", capacity=512, inv_phi=500)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return hh.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "token", "freq", "rnk"
    )
