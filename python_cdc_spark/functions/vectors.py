"""Vector math over ``array<float>`` embedding columns (E26).

Two flavors of each reduction:

- *fast*: plain double arithmetic via ``aggregate``/``zip_with`` —
  JVM-side, the bench/scale path.
- *decimal-exact* (``dec_``-prefixed): element products cast to a fixed
  decimal before summing, so the reduction is order-independent and
  bit-comparable with an external oracle. Use in correctness queries.

Everything is a Column expression — no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits → backed by a compact long in both engines (Spark's Decimal
# fast path, DuckDB int64 decimal); elements are |x|<~10 and dims=64 so
# sums stay far below 10^6
_DEC = "decimal(18,12)"


def dot_product(a: Column, b: Column) -> Column:
    """Fast double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dec_dot_product(a: Column, b: Column) -> Column:
    """Order-independent dot product (decimal accumulation, double out).

    Elements are widened to double BEFORE multiplying so the per-term
    product is the same IEEE double on any engine (float×float keeps
    float precision and casts differently across engines)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)),
            F.lit(0).cast(_DEC),
            # decimal add widens precision; cast back so the accumulator
            # type stays fixed (values are far from overflow)
            lambda acc, x: (acc + x).cast(_DEC),
        ),
        6,
    ).cast("double")


def l2_norm(a: Column, exact: bool = False) -> Column:
    """Euclidean norm; ``exact=True`` uses decimal accumulation."""
    if exact:
        return F.sqrt(
            F.round(
                F.aggregate(
                    F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC)),
                    F.lit(0).cast(_DEC),
                    lambda acc, x: (acc + x).cast(_DEC),
                ),
                6,
            ).cast("double")
        )
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity(a: Column, b: Column, exact: bool = False) -> Column:
    """Cosine similarity; with ``exact`` every reduction is decimal-routed
    and the final quotient is two identical doubles on any engine."""
    if exact:
        return dec_dot_product(a, b) / (l2_norm(a, exact=True) * l2_norm(b, exact=True))
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def dot_expr(a_col: str, b_col: str, dims: int) -> Column:
    """Fast double dot product as ONE generated SQL expression over
    named array columns. Same left-assoc term order as ``dot_product``'s
    fold (identical IEEE result), but whole-stage-codegen'd instead of
    interpreted per element, and a single driver call instead of a py4j
    Column tree. Use in hot paths where the operand column names are
    known; ``dot_product`` remains for arbitrary Column operands."""
    terms = " + ".join(
        f"CAST({a_col}[{i}] AS DOUBLE) * CAST({b_col}[{i}] AS DOUBLE)"
        for i in range(dims)
    )
    return F.expr(terms)


def norm_expr(a_col: str, dims: int) -> Column:
    """Fast double L2 norm as one generated codegen'd SQL expression."""
    terms = " + ".join(
        f"CAST({a_col}[{i}] AS DOUBLE) * CAST({a_col}[{i}] AS DOUBLE)"
        for i in range(dims)
    )
    return F.expr(f"SQRT({terms})")


def dec_dot_terms(a_col: str, b_col: str, dims: int) -> Column:
    """Decimal dot product with NO final round/cast — stays DECIMAL so a
    downstream ``SUM`` across rows (PQ's ADC partial-sum accumulation)
    is still exact and order-independent. Generated-SQL form (one
    ``F.expr``, 0-based element access) for the same codegen/driver-call
    reasons as ``dot_expr``."""
    terms = " + ".join(
        f"CAST(CAST({a_col}[{i}] AS DOUBLE) * CAST({b_col}[{i}] AS DOUBLE)"
        f" AS DECIMAL(18,12))"
        for i in range(dims)
    )
    return F.expr(terms)


def sql_dec_dot_terms(a_expr: str, b_expr: str, dims: int) -> str:
    """DuckDB twin of ``dec_dot_terms`` (1-based element access)."""
    terms = " + ".join(
        f"CAST(CAST({a_expr}[{i}] AS DOUBLE) * CAST({b_expr}[{i}] AS DOUBLE)"
        f" AS DECIMAL(18,12))"
        for i in range(1, dims + 1)
    )
    return f"({terms})"


def sum_sq_expr(a_col: str, b_col: str, dims: int) -> Column:
    """Fast double Σ(a[i]+b[i])² — the reconstruction-norm² partial of a
    two-stage (residual) quantizer, where the codeword is c1 + c2."""
    terms = " + ".join(
        f"(CAST({a_col}[{i}] AS DOUBLE)+CAST({b_col}[{i}] AS DOUBLE))"
        f"*(CAST({a_col}[{i}] AS DOUBLE)+CAST({b_col}[{i}] AS DOUBLE))"
        for i in range(dims)
    )
    return F.expr(terms)


def dec_sum_sq_terms(a_col: str, b_col: str, dims: int) -> Column:
    """Decimal Σ(a[i]+b[i])² with no final round — stays DECIMAL so a
    downstream SUM across subspaces is exact and order-independent."""
    terms = " + ".join(
        f"CAST((CAST({a_col}[{i}] AS DOUBLE)+CAST({b_col}[{i}] AS DOUBLE))"
        f"*(CAST({a_col}[{i}] AS DOUBLE)+CAST({b_col}[{i}] AS DOUBLE))"
        f" AS DECIMAL(18,12))"
        for i in range(dims)
    )
    return F.expr(terms)


def sql_dec_sum_sq_terms(a_expr: str, b_expr: str, dims: int) -> str:
    """DuckDB twin of ``dec_sum_sq_terms`` (1-based element access)."""
    terms = " + ".join(
        f"CAST((CAST({a_expr}[{i}] AS DOUBLE)+CAST({b_expr}[{i}] AS DOUBLE))"
        f"*(CAST({a_expr}[{i}] AS DOUBLE)+CAST({b_expr}[{i}] AS DOUBLE))"
        f" AS DECIMAL(18,12))"
        for i in range(1, dims + 1)
    )
    return f"({terms})"


def sql_dec_dot(a_expr: str, b_expr: str, dims: int) -> str:
    """DuckDB twin of ``dec_dot_product`` via positional unnest-free
    list reduction (explicit element sum keeps evaluation order fixed)."""
    terms = " + ".join(
        f"CAST(CAST({a_expr}[{i}] AS DOUBLE) * CAST({b_expr}[{i}] AS DOUBLE)"
        f" AS DECIMAL(18,12))"
        for i in range(1, dims + 1)
    )
    return f"CAST(ROUND(({terms}), 6) AS DOUBLE)"


def sql_dec_norm(a_expr: str, dims: int) -> str:
    terms = " + ".join(
        f"CAST(CAST({a_expr}[{i}] AS DOUBLE) * CAST({a_expr}[{i}] AS DOUBLE)"
        f" AS DECIMAL(18,12))"
        for i in range(1, dims + 1)
    )
    return f"sqrt(CAST(ROUND(({terms}), 6) AS DOUBLE))"
