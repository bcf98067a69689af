#!/usr/bin/env python
"""ANN append-drift curve (VERDICT r5 item #4).

Frozen-quantizer appends (``append_to_ivfpq_index``) encode new
vectors with the BASE corpus's centroids/codebook. When the appended
vectors drift from the base distribution, coarse cells mis-route them
and the PQ codes represent them poorly — recall decays as the appended
fraction grows. This measures that curve so the re-fit threshold
(``needs_refit``, default 0.5) is a number with evidence behind it.

Protocol: split embeddings by the FIRST COMPONENT's rank (a worst-case
covariate shift — the append distribution is disjoint from the base's
along one axis, far harsher than a fresh crawl slice). Fit quantizers
on the base half only; build indexes at appended fractions 0%..100%
of the drifted half; measure recall@5 of the IVF-PQ probe against
exact brute-force cosine over the same corpus; compare each against a
same-size index whose quantizers were re-fit on its full corpus.

Usage: python tools/bench_ann_drift.py [sf_dir]  (default sf0.01)
Prints one JSON line: {"metric": "ann_append_drift", "curve": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from python_cdc_spark.io import table
    from python_cdc_spark.operators.ann_index import (
        append_to_ivfpq_index,
        appended_fraction,
        ivf_pq_topk_from_index,
        needs_refit,
        save_ivfpq_index,
    )
    from python_cdc_spark.operators.pq import pq_encode, pq_fit
    from python_cdc_spark.operators.similarity import (
        brute_force_top_k,
        kmeans_assign,
        kmeans_fit,
    )
    from python_cdc_spark.session import get_spark

    spark = get_spark()
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # rank by first component: base = lower half, drifted pool = upper
    ranked = e.select(
        "vec_id", "embedding", F.element_at("embedding", 1).alias("c0")
    )
    n = ranked.count()
    cut = ranked.approxQuantile("c0", [0.5], 0.0)[0]
    base = ranked.filter(F.col("c0") <= cut).drop("c0")
    pool = sorted(
        ranked.filter(F.col("c0") > cut).select("vec_id").collect()
    )
    pool_ids = [r["vec_id"] for r in pool]
    n_base = base.count()

    queries = e.filter(F.col("vec_id") % 17 == 0)
    kw = dict(k_top=5, nprobe=8, shortlist=128, m=4, dims=64, exact=False)

    def recall(index_dir: str, corpus) -> float:
        approx = ivf_pq_topk_from_index(spark, corpus, index_dir, queries, **kw)
        exact = brute_force_top_k(corpus, queries, "vec_id", "embedding", k=5, exact=False)
        a = {(r[0], r[1]) for r in approx.select("query_id", "neighbor_id").collect()}
        x = {(r[0], r[1]) for r in exact.select("query_id", "neighbor_id").collect()}
        return len(a & x) / len(x)

    def build(docs, out, cent, book):
        assigned = kmeans_assign(
            docs, cent, "vec_id", "embedding", exact=False
        ).select(F.col("vec_id").alias("neighbor_id"), "cell")
        codes = pq_encode(docs, book, "vec_id", "embedding", m=4, dims=64, exact=False)
        save_ivfpq_index(out, cent, assigned, codes, book, params={"drift": 1})

    cent0 = kmeans_fit(base, "vec_id", "embedding", k=16, iters=4, exact=False)
    book0 = pq_fit(base, "vec_id", "embedding", m=4, dims=64, k=16, iters=2, exact=False)

    curve = []
    tmp = tempfile.mkdtemp(prefix="ann_drift_")
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        take = pool_ids[: int(len(pool_ids) * frac)]
        corpus = (
            base.unionByName(e.filter(F.col("vec_id").isin(take)))
            if take
            else base.select("vec_id", "embedding")
        )
        d_frozen = os.path.join(tmp, f"frozen_{int(frac*100)}")
        build(base, d_frozen, cent0, book0)
        if take:
            append_to_ivfpq_index(
                spark, d_frozen, e.filter(F.col("vec_id").isin(take)),
                kind="pq", m=4, dims=64, exact=False,
            )
        # re-fit comparator: quantizers fitted on THIS corpus
        d_refit = os.path.join(tmp, f"refit_{int(frac*100)}")
        cent1 = kmeans_fit(corpus, "vec_id", "embedding", k=16, iters=4, exact=False)
        book1 = pq_fit(corpus, "vec_id", "embedding", m=4, dims=64, k=16, iters=2, exact=False)
        build(corpus, d_refit, cent1, book1)
        curve.append(
            {
                "appended_frac_of_base": round(appended_fraction(d_frozen), 3),
                "needs_refit_at_0.5": needs_refit(d_frozen),
                "recall5_frozen": round(recall(d_frozen, corpus), 3),
                "recall5_refit": round(recall(d_refit, corpus), 3),
            }
        )
    print(
        json.dumps(
            {
                "metric": "ann_append_drift",
                "sf_dir": sf_dir,
                "n_vectors": n,
                "n_base": n_base,
                "curve": curve,
            }
        )
    )


if __name__ == "__main__":
    main()
