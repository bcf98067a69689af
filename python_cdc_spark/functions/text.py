"""Text-analysis expressions for LLM-pipeline operators (E27).

Tokenization, n-grams, quality features, language-ID heuristics — all
as JVM-side Column expressions (split/transform/aggregate), no UDFs.
Every expression has a DuckDB-expressible twin so the queries built on
them are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword profiles for the n-gram/stopword heuristic
#: language ID. Deliberately small and deterministic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}


def normalized_text(col: Column) -> Column:
    """Lowercase, whitespace-collapsed text (dedup/fingerprint basis)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalized_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-grams over an ALREADY-MATERIALIZED token-array column;
    empty array when too short.

    Hot paths must pass a projected column (``select(tokens(text)
    .alias("__toks"))`` in a separate select), not the ``tokens(...)``
    expression inline: the transform's lambda body references the token
    array once per gram element, lambda bodies are excluded from
    Catalyst's subexpression elimination (they may run 0..N times), and
    interpreted HOF evaluation re-computes the full referenced
    expression tree per access — with inline ``tokens(text)`` that is
    the whole regex tokenization ~3x PER GRAM (measured 12.6 s for the
    sf0.1 gram explode; 0.45 s against a projected column, r13).
    CollapseProject keeps the projection: it declines to inline an
    expensive alias referenced more than once."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-grams as an array<string>; empty array when too short.

    Built with sequence+transform (no explode needed by callers that
    only aggregate over the grams). Fine for one-shot expressions over
    short text; HOT paths should project ``tokens(col)`` first and use
    ``word_ngrams_from_tokens`` (see its docstring for why).
    """
    return word_ngrams_from_tokens(tokens(col), n)


def quality_features(col: Column, toks: Column | None = None) -> dict[str, Column]:
    """Deterministic quality-scoring features over a text column.

    Mirrors common LLM-corpus filters: length, token stats, punctuation
    and stopword ratios. All counts are exact integers; ratios are
    single double divisions (portable).

    ``toks`` lets hot callers pass a PROJECTED token-array column so the
    tokenizer runs once per row instead of once per referencing
    expression (~5 occurrences here; same interpreter reasoning as
    ``word_ngrams_from_tokens``, at per-row rather than per-element
    multiplicity).
    """
    toks = toks if toks is not None else tokens(col)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(col).cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace(col, r"[.!?,;:]", ""))
    ).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin([s for v in LANG_STOPWORDS.values() for s in v]))
    ).cast("long")
    mean_tok_len = (
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
        ).cast("double")
        / n_tok
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_punct": n_punct,
        "punct_ratio": n_punct.cast("double") / n_chars,
        "stopword_hits": stop_hits,
        "stopword_ratio": stop_hits.cast("double") / n_tok,
        "mean_token_len": mean_tok_len,
    }


def lang_guess(col: Column, toks: Column | None = None) -> Column:
    """Stopword-profile language ID: the language with the most stopword
    hits wins; zero hits falls back to 'en'. Deterministic tie-break:
    struct comparison (hits, lang) — ties pick the lexicographically
    LARGEST language code, reproducible in plain SQL. ``toks``: see
    ``quality_features`` (5 filter inputs reference the tokenization)."""
    toks = toks if toks is not None else tokens(col)
    hits = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(list(words)))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    best = F.greatest(*hits) if len(hits) > 1 else hits[0]
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("en"))


def myers_levenshtein_udf():
    """Exact Levenshtein distance as an Arrow-batched Pandas UDF using
    Myers' bit-parallel algorithm (Myers 1999 / Hyyrö 2001, public) —
    the verify kernel for LSH candidate pairs.

    Why Python here, when the rule is "stay JVM-side": the JVM banded
    ``levenshtein(a, b, t)`` walks O(t·len) matrix CELLS per pair
    (measured 115 s for 300k ~320-char pairs at sf1); the bit-parallel
    formulation processes a whole pattern-length bit-vector per text
    character in a handful of integer ops — Python's arbitrary-precision
    ints hold the vector in ⌈len/64⌉ machine words, so the inner loop is
    O(len) bigint ops instead of O(0.3·len²) cell updates. Measured
    ≥10x faster than the JVM kernel at sf1 despite the interpreter
    (SCALE.md §Dedup); Arrow batching keeps transfer vectorized and the
    pairs stay partition-parallel. Distances are EXACTLY the DP values
    (DuckDB's levenshtein replays them bit-for-bit — strict hash gate).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dist(a: str, b: str) -> int:
        if a == b:
            return 0
        if len(a) > len(b):
            a, b = b, a  # pattern = shorter string: fewer bit-words
        m = len(a)
        if m == 0:
            return len(b)
        peq: dict[str, int] = {}
        bit = 1
        for ch in a:
            peq[ch] = peq.get(ch, 0) | bit
            bit <<= 1
        mask = (1 << m) - 1
        hbit = 1 << (m - 1)
        pv, mv, score = mask, 0, m
        get = peq.get
        for ch in b:
            eq = get(ch, 0)
            xv = eq | mv
            xh = (((eq & pv) + pv) ^ pv) | eq
            ph = mv | (~(xh | pv) & mask)
            mh = pv & xh
            if ph & hbit:
                score += 1
            elif mh & hbit:
                score -= 1
            ph = ((ph << 1) | 1) & mask
            mh = (mh << 1) & mask
            pv = mh | (~(xv | ph) & mask)
            mv = ph & xv
        return score

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf cannot resolve the function-local `pd`
    def _lev(ta, tb):
        return pd.Series(
            [_dist(x or "", y or "") for x, y in zip(ta, tb)], dtype="int64"
        )

    # asNondeterministic: the kernel IS deterministic, but without this
    # Catalyst pushes a filter on the UDF column below the fan-out
    # repartition and evaluates the kernel TWICE — once inside the
    # narrow join stage (serialized, measured +50 s at sf1) and again
    # after the exchange. Marking it non-deterministic pins one
    # evaluation at its written position.
    return pandas_udf(_lev, "long").asNondeterministic()
