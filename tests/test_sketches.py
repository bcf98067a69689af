"""Estimator-quality bounds for the sketch family.

The driver's oracle gate proves both engines compute the SAME estimate;
these tests pin that the estimate is also a GOOD one — a refactor that
kept cross-engine determinism but broke accuracy (wrong rho, dropped
empty-bucket term, bad alpha) would pass the differ and fail here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_cdc_spark.io import table
from python_cdc_spark.queries import QUERIES
from tests.conftest import SF_CORRECT


def _rows(spark, name):
    return QUERIES[name].fn(spark, SF_CORRECT).collect()


def test_hll_error_within_design_band(spark):
    """Raw HLL at m=256 has ~1.04/sqrt(m) = 6.5% std error; rel_err on
    the fixed testdata is deterministic — pin it under 2 sigma."""
    (row,) = _rows(spark, "sketch_hll_orderkeys")
    assert row["exact_orderkeys"] > 0
    assert row["rel_err"] < 0.13, row

def test_hll_groupwise_error_bounds(spark):
    """m=32 per group -> ~18% std error; every group must be sane and
    the MEDIAN group well inside 1 sigma."""
    rows = _rows(spark, "sketch_hll_groupwise")
    errs = sorted(r["rel_err"] for r in rows)
    assert all(e < 0.75 for e in errs), errs[-3:]
    assert errs[len(errs) // 2] < 0.20


def test_countmin_never_underestimates_and_is_tight(spark):
    rows = _rows(spark, "sketch_countmin_partkeys")
    assert len(rows) == 20
    for r in rows:
        assert r["cm_estimate"] >= r["exact_n"]
        # d=4 rows of w=1024: expected overcount per row ~ N/w ~ 59 at
        # sf0.01; min-of-4 should stay within a small multiple of that
        assert r["overcount"] <= 4 * (60000 // 1024), r


def test_kmv_jaccard_and_cardinalities(spark):
    (row,) = _rows(spark, "sketch_kmv_returnflag_overlap")
    assert abs(row["jaccard_est"] - row["jaccard_exact"]) < 0.10
    for est, exact in [
        (row["est_a"], row["exact_a"]),
        (row["est_b"], row["exact_b"]),
        (row["est_union"], row["exact_a"] + row["exact_b"]
         - row["exact_intersection"]),
        (row["est_intersection"], row["exact_intersection"]),
    ]:
        assert abs(est / exact - 1.0) < 0.20, (est, exact)


def test_rollup_distinct_parts_errors(spark):
    rows = _rows(spark, "rollup_distinct_parts_rewrite")
    assert rows, "no year groups"
    errs = sorted(r["rel_err"] for r in rows)
    assert all(e < 0.25 for e in errs), errs[-3:]
    assert errs[len(errs) // 2] < 0.10


def test_kmv_small_set_guard_is_exact(spark, tmp_path):
    """Sets smaller than k: the sketch IS the distinct set, so every
    estimate must be EXACT (and still hash-match the oracle)."""
    import duckdb

    from tests.oracle import assert_matches_oracle

    rows = [(i, "R") for i in range(20)] + [(i, "A") for i in range(10, 40)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_returnflag string")
    sf = tmp_path / "tiny"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "lineitem.parquet"))

    spec = QUERIES["sketch_kmv_returnflag_overlap"]
    out = spec.fn(spark, str(sf)).collect()[0]
    assert out["est_a"] == float(out["exact_a"]) == 20.0
    assert out["est_b"] == float(out["exact_b"]) == 30.0
    assert out["est_union"] == 40.0
    assert out["est_intersection"] == float(out["exact_intersection"]) == 10.0
    assert out["jaccard_est"] == out["jaccard_exact"] == 0.25

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet/*.parquet')"
    )
    assert_matches_oracle(
        spec.fn(spark, str(sf)), con, spec.oracle, name="kmv_small"
    )


def test_sketch_merge_is_order_independent(spark, tmp_path):
    """Register/counter merges must be associative and commutative:
    folding three key partitions in two different orders (and in one
    shot) yields the identical sketch state — the property that makes
    the sketches safe as Spark partial aggregates AND as streaming
    folds in any micro-batch arrival order."""
    from python_cdc_spark.streaming.sketch_stream import (
        StreamingSketchAggregator,
    )

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey"
    )
    parts = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]

    def fold(order, path):
        agg = StreamingSketchAggregator(spark, str(tmp_path / path), "l_orderkey")
        for j, i in enumerate(order):
            agg.fold_batch(parts[i], batch_id=j)
        return (
            {(r["bucket"], r["r"]) for r in agg.registers().collect()},
            {(r["i"], r["bucket"], r["n"]) for r in agg.counters().collect()},
        )

    fwd = fold([0, 1, 2], "fwd")
    rev = fold([2, 1, 0], "rev")
    one = StreamingSketchAggregator(spark, str(tmp_path / "one"), "l_orderkey")
    one.fold_batch(li, batch_id=0)
    oneshot = (
        {(r["bucket"], r["r"]) for r in one.registers().collect()},
        {(r["i"], r["bucket"], r["n"]) for r in one.counters().collect()},
    )
    assert fwd == rev == oneshot


def test_kll_rank_error_within_bound(spark):
    """The KLL estimates must honor the schedule's rank-error bound:
    |exact_rank - target_rank| <= sum_b 2^(t_b), where t_b is each
    bucket's fixed compaction depth (recomputed here from the same
    counts); values must be monotone across deciles. Runs the
    rank-verify VARIANT — the registered production query drops the
    exact-rank second scan (r10 verdict #3), so this test carries the
    quality gate, and also pins that the production query's estimates
    equal the verified variant's."""
    from python_cdc_spark.queries import QUERIES
    from python_cdc_spark.queries.sketches import (
        _mix32,
        kll_quantiles_with_rank_verify,
    )
    from tests.conftest import SF_CORRECT

    rows = sorted(
        kll_quantiles_with_rank_verify(spark, SF_CORRECT).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    vals = [r["kll_value"] for r in rows]
    assert vals == sorted(vals)
    prod = sorted(
        QUERIES["sketch_kll_quantiles"].fn(spark, SF_CORRECT).collect(),
        key=lambda r: r["decile"],
    )
    assert [
        (r["decile"], r["kll_value"], r["target_rank"], r["n_rows"]) for r in prod
    ] == [
        (r["decile"], r["kll_value"], r["target_rank"], r["n_rows"]) for r in rows
    ]

    li = table(spark, SF_CORRECT, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid")
    )
    counts = (
        li.withColumn("bucket", _mix32(F.col("rid")) % 64)
        .groupBy("bucket")
        .count()
        .collect()
    )
    bound = 0
    for r in counts:
        q = (r["count"] + 255) // 256
        t = 0 if q == 1 else (q - 1).bit_length()
        bound += 1 << t
    n = rows[0]["n_rows"]
    for r in rows:
        err = abs(r["exact_rank"] - r["target_rank"])
        assert err <= bound, (r["decile"], err, bound)
        assert err / n < 0.02  # and the bound itself is tight at ~2n/k


def test_kll_stream_fold_quality_and_replay(spark, tmp_path):
    """Streaming KLL: three micro-batch folds and a one-shot fold must
    BOTH land within the sketch's rank tolerance of the exact
    quantiles (compaction is history-dependent, so bit-equality is the
    batch query's job, not this one); a replayed batch id must be a
    no-op; a crashed version dir must be rewritten."""
    import os as _os

    from python_cdc_spark.streaming.sketch_stream import KllStreamSketch

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
        F.col("l_extendedprice").alias("v"),
    )
    exact = [
        r["v"]
        for r in li.orderBy("v", "rid").collect()
    ]
    n = len(exact)
    qs = [0.25, 0.5, 0.75]

    def check(est):
        for q, v in est.items():
            # true rank of the estimate within the exact ordering
            import bisect

            rank = bisect.bisect_right(exact, v)
            assert abs(rank - q * n) / n < 0.08, (q, v, rank, q * n)

    streamed = KllStreamSketch(
        spark, str(tmp_path / "s3"), "v", "rid", k=128, n_buckets=4
    )
    for i in range(3):
        streamed.fold_batch(li.filter(F.col("rid") % 3 == i), batch_id=i)
    check(streamed.quantile_estimates(qs))

    oneshot = KllStreamSketch(
        spark, str(tmp_path / "s1"), "v", "rid", k=128, n_buckets=4
    )
    oneshot.fold_batch(li, batch_id=0)
    check(oneshot.quantile_estimates(qs))

    # state stays sketch-sized: every (bucket, level) buffer fits in k
    sizes = streamed.state().groupBy("bucket", "level").count().collect()
    assert sizes and all(r["count"] <= 128 for r in sizes)

    # replay no-op
    before = sorted(map(tuple, streamed.state().collect()))
    streamed.fold_batch(li.filter(F.col("rid") % 3 == 0), batch_id=0)
    after = sorted(map(tuple, streamed.state().collect()))
    assert before == after

    # crashed next-version dir is deleted and rewritten
    v = streamed._meta()["version"]
    orphan = streamed._vdir(v + 1)
    _os.makedirs(orphan)
    open(_os.path.join(orphan, "junk"), "w").write("x")
    streamed.fold_batch(li.filter(F.col("rid") % 3 == 0).limit(50), batch_id=9)
    assert streamed._meta()["version"] == v + 1
    assert not _os.path.exists(_os.path.join(orphan, "junk"))
    check(streamed.quantile_estimates(qs))


def test_bloom_delta_prune_semantics(spark):
    """Pin the membership contract of cdc_bloom_delta_prune: the bloom
    has NO false negatives (every delta-touched base row lands in the
    'touched' band, never 'pruned'), the three bands partition the base
    exactly, and the measured false-positive band matches an exact
    recomputation (bloom-hit keys minus delta keys)."""
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.queries.sketches import cdc_bloom_delta_prune

    sf = "/root/testdata/sf0.01"
    rows = {r["band"]: r for r in cdc_bloom_delta_prune(spark, sf).collect()}

    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    delta_keys = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    n_base = li.count()
    touched_exact = (
        li.join(
            delta_keys, li["l_orderkey"] == delta_keys["k"], "left_semi"
        ).count()
    )

    # bands partition the base row-for-row
    assert sum(r["n_rows"] for r in rows.values()) == n_base
    assert abs(sum(r["share_rows"] for r in rows.values()) - 1.0) < 1e-12
    # no false negatives: the touched band is EXACTLY the delta join
    assert rows["touched"]["n_rows"] == touched_exact
    # the filter actually prunes: misses dominate at a ~2% delta
    assert rows["pruned"]["n_rows"] > rows["touched"]["n_rows"]
    # fp band is small at 2^20 bits over a sf0.01 delta and measured
    fp = rows.get("false_positive")
    if fp is not None:
        assert fp["n_rows"] < 0.05 * n_base


def test_priority_sample_estimator(spark):
    """Pin corpus_sample_weighted_priority: exactly k rows ranked by
    priority, every kept priority >= tau (the k+1-th), est_weight is
    max(weight, tau), and tau matches a from-scratch recomputation of
    the (k+1)-th largest w/u priority."""
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.queries.llm_curation import (
        _PRIO_K,
        corpus_sample_weighted_priority,
    )
    from python_cdc_spark.queries.sketches import _mix32

    sf = "/root/testdata/sf0.01"
    out = corpus_sample_weighted_priority(spark, sf).collect()
    assert len(out) == _PRIO_K
    assert sorted(r["sample_rank"] for r in out) == list(range(1, _PRIO_K + 1))

    prio = (
        F.col("n_chars").cast("double")
        * F.lit(4294967296.0)
        / (_mix32(F.col("doc_id")) + F.lit(1)).cast("double")
    )
    all_p = sorted(
        (
            r["p"]
            for r in table(spark, sf, "documents")
            .select(prio.alias("p"))
            .collect()
        ),
        reverse=True,
    )
    tau = all_p[_PRIO_K]  # (k+1)-th largest
    for r in out:
        assert r["priority"] >= tau
        assert r["est_weight"] == max(float(r["weight"]), tau)
    # the estimator tracks the true total weight within priority
    # sampling's expected error (loose smoke bound, deterministic data)
    w_true = (
        table(spark, sf, "documents")
        .agg(F.sum("n_chars"))
        .collect()[0][0]
    )
    w_est = sum(r["est_weight"] for r in out)
    assert 0.5 * w_true < w_est < 2.0 * w_true


def test_priority_sample_tiny_corpus(spark, tmp_path):
    """Pin the ADVICE-r9 degenerate case: a corpus with <= k rows has no
    (k+1)-th priority, so tau falls back to 0.0 and the query returns
    the FULL population with est_weight == weight (not a silently empty
    frame), and the DuckDB oracle agrees row-for-row."""
    import duckdb

    from python_cdc_spark.queries import QUERIES
    from python_cdc_spark.queries.llm_curation import _PRIO_K
    from tests.oracle import assert_matches_oracle

    n = _PRIO_K - 3
    tiny = spark.createDataFrame(
        [(i + 1, 100 + 7 * i) for i in range(n)], "doc_id long, n_chars long"
    )
    sf_dir = str(tmp_path)
    tiny.write.parquet(f"{sf_dir}/documents.parquet")

    spec = QUERIES["corpus_sample_weighted_priority"]
    out = spec.fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == n
    for r in rows:
        assert r["est_weight"] == float(r["weight"])

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        assert_matches_oracle(out, con, spec.oracle,
                              name="corpus_sample_weighted_priority_tiny")
    finally:
        con.close()


def test_lsh_verified_scale_hint_paths(spark):
    """Pin the ADVICE-r9 scale_hint gate on lsh_verified_pairs: the
    'small' (broadcast, no probe), 'large' (shuffle_hash, no probe),
    and default (measured) paths return identical verified pairs."""
    from python_cdc_spark.queries.llm_dedup import lsh_verified_pairs
    from tests.conftest import SF_SMOKE

    def rows(hint):
        return sorted(
            map(tuple, lsh_verified_pairs(spark, SF_SMOKE,
                                          scale_hint=hint).collect())
        )

    measured = rows(None)
    assert measured == rows("small")
    assert measured == rows("large")
    assert len(measured) > 0
