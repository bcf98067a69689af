"""Product quantization (PQ): memory-bounded vectors for 100 TB ANN.

At real corpus scale the vectors themselves stop fitting anywhere
useful: 64 float64 dims = 512 B/vector → half a petabyte per trillion
vectors just for the embeddings. PQ stores each vector as ``m`` small
codes (here 4 × 1 byte): split the vector into ``m`` subvectors, fit an
independent k-means codebook per subspace, and keep only each
subvector's nearest codeword id — a 128× compression at this setting.

Query-time scoring is ADC (asymmetric distance computation): the query
stays exact; each (subspace, codeword) partial dot product is
precomputed into a lookup table (|Q| × m × k rows — tiny), and a
candidate's approximate cosine is the sum of its codes' partials over
the reconstruction norm. The scan therefore touches only the CODES
table (4 bytes/vector), never the vectors; exact re-rank then reads
true vectors for the shortlist only.

Built entirely from the existing deterministic k-means
(operators/similarity.py — md5-seeded, RNG-free), so fits are
reproducible run-to-run. Spark shapes: codebook fits collect k×(dims/m)
doubles per subspace (metadata), encoding is a broadcast-assign per
subspace (no corpus shuffle), ADC is one join of the codes table
against the broadcast LUT + a grouped sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from python_cdc_spark.operators.similarity import kmeans_assign, kmeans_fit


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    dims: int = 64,
    k: int = 16,
    iters: int = 2,
    exact: bool = False,
) -> DataFrame:
    """Fit ``m`` independent sub-quantizers. Returns the codebook
    ``(sub int, cell int, cvec array<double>)`` — m × k rows."""
    d = dims // m
    parts = []
    for s in range(m):
        sub = corpus.select(
            F.col(id_col), F.slice(vec_col, s * d + 1, d).alias("subv")
        )
        cb = kmeans_fit(sub, id_col, "subv", k=k, iters=iters, exact=exact, dims=d)
        parts.append(cb.select(F.lit(s).alias("sub"), "cell", "cvec"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    dims: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Quantize: each vector → ``m`` codes. Returns ``(id, sub, code)``
    — the 4-byte-per-vector representation the 100 TB scan reads."""
    d = dims // m
    outs = []
    for s in range(m):
        sub = corpus.select(
            F.col(id_col), F.slice(vec_col, s * d + 1, d).alias("subv")
        )
        cb = codebook.filter(F.col("sub") == s).select("cell", "cvec")
        assigned = kmeans_assign(sub, cb, id_col, "subv", exact=exact, dims=d)
        outs.append(
            assigned.select(
                F.col(id_col), F.lit(s).alias("sub"), F.col("cell").alias("code")
            )
        )
    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out


def pq_adc_topk(
    corpus: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_top: int = 5,
    shortlist: int = 64,
    m: int = 4,
    dims: int = 64,
    exact: bool = False,
) -> DataFrame:
    """ADC scan + exact re-rank: approximate-cosine shortlist per query
    from the CODES table only, then exact cosine on the shortlist.

    Returns ``(query_id, neighbor_id, cosine, rank)`` with rank ≤
    ``k_top``. The scan-side join touches (id, sub, code) rows and a
    broadcast LUT; true vectors are read only for ``shortlist`` ids per
    query in the re-rank — the memory contract that makes PQ the
    trillion-vector path.

    ``exact=True`` routes the LUT partials and the cross-subspace sums
    through decimals (order-independent, bit-replayable by the DuckDB
    oracle); the default double math is the bench/scale path — identical
    plan shape, the decimal routing exists only for oracle hashing."""
    from python_cdc_spark.functions.vectors import (
        dec_dot_product,
        dec_dot_terms,
        dot_expr,
        l2_norm,
        norm_expr,
    )

    d = dims // m
    qsubs = None
    for s in range(m):
        part = queries.select(
            F.col(id_col).alias("query_id"),
            F.lit(s).alias("sub"),
            F.slice(vec_col, s * d + 1, d).alias("qsub"),
        )
        qsubs = part if qsubs is None else qsubs.unionByName(part)
    # LUT: per (query, subspace, codeword): partial dot + codeword norm²
    if exact:
        pdot = dec_dot_terms("qsub", "cvec", d)
        cn2 = dec_dot_terms("cvec", "cvec", d)
    else:
        pdot = dot_expr("qsub", "cvec", d)
        cn2 = F.expr(
            " + ".join(
                f"CAST(cvec[{i}] AS DOUBLE) * CAST(cvec[{i}] AS DOUBLE)"
                for i in range(d)
            )
        )
    lut = qsubs.join(broadcast(codebook), "sub").select(
        "query_id",
        "sub",
        F.col("cell").alias("code"),
        pdot.alias("pdot"),
        cn2.alias("cn2"),
    )
    if exact:
        # decimal partials sum exactly in any order; one final round →
        # the same double on both engines
        qdot_out = F.round(F.sum("pdot"), 6).cast("double").alias("qdot")
        n2_out = F.round(F.sum("cn2"), 6).cast("double").alias("n2")
    else:
        qdot_out = F.sum("pdot").alias("qdot")
        n2_out = F.sum("cn2").alias("n2")
    scored = (
        codes.join(broadcast(lut), ["sub", "code"])
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(qdot_out, n2_out)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("approx", F.col("qdot") / F.sqrt(F.col("n2")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: vectors read ONLY for shortlist ids (co-partitioned
    # join on neighbor_id — never a corpus broadcast)
    qn = l2_norm(F.col(vec_col), exact=True) if exact else norm_expr(vec_col, dims)
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        qn.alias("qn"),
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        qn.alias("nn"),
    )
    rdot = (
        dec_dot_product(F.col("qv"), F.col("nv"))
        if exact
        else dot_expr("qv", "nv", dims)
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        short.join(broadcast(qv), "query_id")
        .join(nv.hint("shuffle_hash"), "neighbor_id")
        .withColumn("cosine", rdot / (F.col("qn") * F.col("nn")))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
