"""Distributed PCA over embedding columns: one-pass sufficient stats,
driver-side eigendecomposition, broadcast projection.

The standard pre-step of a large-scale embedding pipeline (whitening
before product quantization, dimensionality reduction before ANN or
clustering) — and the textbook case for the suffstats pattern the
engine already uses for linear regression (queries/ml_queries.py): the
data-sized object (n × d vectors) never leaves the executors; what
crosses to the driver is one (n, Σx, XᵀX) triple per PARTITION —
O(partitions · d²) doubles, metadata-scale for embedding dims (d=64 →
4 KiB + 32 KiB per partition). The d × d eigendecomposition is driver
math on that metadata, and the fitted model broadcasts back for an
Arrow-batched projection — no shuffle anywhere in fit or transform.

At 100 TB this is exactly the shape that survives: fit cost is one
corpus scan with per-partition numpy accumulation (BLAS ``X.T @ X``
per Arrow batch), the reduce is O(partitions) rows, and transform is
embarrassingly parallel. Contrast the naive formulation (explode to
(i, j, x_i·x_j) rows and groupBy) which inflates the corpus d²/2-fold
before the shuffle.

Determinism: partial Gram accumulation is float64 and partition-order
dependent in the last ulps, so fitted components are reproducible
run-to-run on a fixed layout but not bit-pinned across engines; the
oracle-gated covariance query (queries/ml_queries.py
``ml_pca_covariance_block``) decimal-routes a dim block instead, and
tests pin this module against full-data numpy (sign-canonicalized).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUFF_SCHEMA = "n long, s array<double>, g array<double>"


def suffstats(df: DataFrame, vec_col: str, d: int):
    """(n, Σx, XᵀX) accumulated per partition, reduced on the driver —
    the exact mergeable monoid behind both the one-shot fit and the
    streaming fold. Returns (n, s, g) with s a length-d numpy vector
    and g the d×d Gram matrix."""
    import numpy as np

    def part(batches: Iterator) -> Iterator:
        import pandas as pd

        n = 0
        s = np.zeros(d)
        g = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != d:
                raise ValueError(f"expected {d}-dim vectors, got {x.shape[1]}")
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    parts = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())  # a null vector would fail np.stack
        .mapInPandas(part, _SUFF_SCHEMA)
        .collect()
    )
    if not parts:
        return 0, np.zeros(d), np.zeros((d, d))
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    return n, s, g


def model_from_suffstats(n: int, s, g, k: int) -> dict:
    """The driver-side eigen step over mergeable sufficient statistics
    (n, Σx, XᵀX) — shared by the one-shot fit and the streaming fold
    (``streaming/pca_stream.py``), because the stats are an exact
    commutative monoid: two datasets' (n, s, G) triples ADD."""
    import numpy as np

    if n <= 0:
        raise ValueError("pca: empty input (no non-null vectors)")
    s = np.asarray(s, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64).reshape(len(s), len(s))
    mean = s / n
    # covariance with the mean correction folded in: Σxxᵀ/n − μμᵀ
    # (population form; the n/(n−1) choice washes out of eigenvectors)
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "n": int(n),
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": [float(max(evals[o], 0.0)) for o in order],
    }


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    dims: int = 64,
) -> dict:
    """Fit a k-component PCA. Returns a plain-dict model:
    ``mean`` (d), ``components`` (k × d rows, orthonormal, descending
    eigenvalue), ``explained_variance`` (k), ``n`` — all Python lists,
    broadcast-sized and JSON-serializable (same persistence contract as
    the ANN index models).

    Eigenvector SIGN is canonicalized (largest-|coordinate| entry made
    positive) so fits are comparable across runs and engines — eigh is
    otherwise free to flip any component."""
    n, s, g = suffstats(df, vec_col, dims)
    return model_from_suffstats(n, s, g, k)


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project vectors onto the fitted components: (x − μ) Wᵀ, optionally
    whitened (each coordinate divided by √eigenvalue so the output has
    identity covariance — the PQ/ANN pre-conditioning). Arrow-batched
    BLAS per partition; the model rides as a closure broadcast."""
    import numpy as np

    mean = np.asarray(model["mean"])
    w = np.asarray(model["components"])  # k × d
    if whiten:
        scale = np.sqrt(np.maximum(np.asarray(model["explained_variance"]), 1e-12))
        w = w / scale[:, None]

    from pyspark.sql.functions import pandas_udf

    def _proj(col):
        import pandas as pd

        if not len(col):
            return pd.Series([], dtype="object")
        # Nulls pass through as null output (fit-path parity: suffstats
        # filters isNotNull; np.stack on a None would die mid-executor).
        vals = col.to_numpy()
        mask = np.array([v is not None for v in vals])
        out = np.empty(len(vals), dtype=object)
        out[~mask] = None
        if mask.any():
            x = np.stack(vals[mask]).astype(np.float64)
            y = (x - mean) @ w.T
            for i, row in zip(np.nonzero(mask)[0], y):
                out[i] = row
        return pd.Series(list(out))

    proj = pandas_udf(_proj, "array<double>")
    return df.withColumn(out_col, proj(F.col(vec_col)))


def reconstruction_error(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error ‖x − (μ + projᵀW)‖² — the
    quality scalar a pipeline monitors when choosing k. One scan,
    per-partition accumulation, O(partitions) reduce."""
    import numpy as np

    mean = np.asarray(model["mean"])
    w = np.asarray(model["components"])

    def part(batches: Iterator) -> Iterator:
        import pandas as pd

        n, tot = 0, 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            r = (x - mean) @ w.T @ w + mean - x
            n += x.shape[0]
            tot += float((r * r).sum())
        if n:
            yield pd.DataFrame({"n": [n], "t": [tot]})

    rows = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())  # fit-path parity (suffstats)
        .mapInPandas(part, "n long, t double")
        .collect()
    )
    n = sum(r["n"] for r in rows)
    return (sum(r["t"] for r in rows) / n) if n else 0.0
