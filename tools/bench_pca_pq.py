#!/usr/bin/env python
"""PCA-rotated PQ (OPQ-lite): measure whether an eigen-aligned,
variance-balanced rotation improves PQ recall at EQUAL code budget.

Plain PQ slices the vector into m contiguous subvectors; when dims are
correlated (real embeddings always are), each subspace wastes codewords
re-expressing shared variance. The classic fix (OPQ's initialization)
is to rotate into the PCA basis first — an ORTHOGONAL transform, so
cosine/dot geometry (and therefore the exact ground-truth neighbor
sets) are preserved bit-for-bit in expectation — and spread the
principal components round-robin across the m groups so no subspace
hoards all the variance. Same m, same k, same shortlist: any recall
delta is purely better codeword allocation.

Rotation only — NO centering, NO whitening: subtracting the mean or
rescaling by eigenvalues would change cosine and with it the ground
truth; the components of the centered covariance applied as a pure
rotation keep the metric while aligning axes.

Usage: python tools/bench_pca_pq.py [sf_dir]   (default sf0.01)
Prints one JSON line {"metric": "pca_pq_recall", ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.pca import pca_fit, pca_transform
    from python_cdc_spark.operators.pq import pq_adc_topk, pq_encode, pq_fit
    from python_cdc_spark.operators.similarity import brute_force_top_k
    from python_cdc_spark.session import get_spark

    spark = get_spark(app_name="bench_pca_pq")
    spark.sparkContext.setLogLevel("ERROR")
    m, dims, k_cb, k_top, shortlist = 4, 64, 16, 5, 16

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = e.filter(F.col("vec_id") % 17 == 0)
    exact = brute_force_top_k(
        e, queries, "vec_id", "embedding", k=k_top, exact=False
    )
    truth = {
        (r[0], r[1])
        for r in exact.select("query_id", "neighbor_id").collect()
    }

    def recall(corpus, qs) -> float:
        book = pq_fit(corpus, "vec_id", "embedding", m=m, dims=dims, k=k_cb, iters=2)
        codes = pq_encode(corpus, book, "vec_id", "embedding", m=m, dims=dims)
        top = pq_adc_topk(
            corpus, codes, book, qs,
            k_top=k_top, shortlist=shortlist, m=m, dims=dims,
        )
        got = {
            (r[0], r[1])
            for r in top.select("query_id", "neighbor_id").collect()
        }
        return len(got & truth) / len(truth)

    r_raw = recall(e, queries)

    # full-rank PCA; spread components round-robin over the m groups so
    # each subspace receives eigenvalues {g, g+m, g+2m, ...} — without
    # this the first subvector hoards nearly all the variance and plain
    # contiguous slicing can get WORSE than no rotation
    model = pca_fit(e, "embedding", k=dims, dims=dims)
    order = [j for g in range(m) for j in range(dims) if j % m == g]
    rot = {
        "n": model["n"],
        "mean": [0.0] * dims,  # rotation only: centering would change cosine
        "components": [model["components"][j] for j in order],
        "explained_variance": [model["explained_variance"][j] for j in order],
    }

    def rotate(df):
        return (
            pca_transform(df, rot, "embedding", out_col="__r")
            .select("vec_id", F.col("__r").alias("embedding"))
            .localCheckpoint(eager=False)
        )

    r_pca = recall(rotate(e), rotate(queries))

    print(
        json.dumps(
            {
                "metric": "pca_pq_recall",
                "sf_dir": sf_dir,
                "n_vectors": e.count(),
                "m": m,
                "k_codebook": k_cb,
                "shortlist": shortlist,
                "recall5_pq_raw": round(r_raw, 3),
                "recall5_pq_pca_rotated": round(r_pca, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
