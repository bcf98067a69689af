"""Distributed BPE merge learning (tokenizer FITTING, not application).

``text_bpe_token_estimate`` (queries/llm_text.py) applies a FIXED merge
table; this operator learns one at corpus scale — the classic
byte-pair-encoding greedy loop (Sennrich et al. 2016, public algorithm):

    repeat n_merges times:
        count adjacent symbol pairs over the word-frequency table
        pick the most frequent pair (ties: lexicographic (lhs, rhs))
        merge that pair left-to-right, non-overlapping, in every word

Scale shape (the part that matters at 100 TB):

- The CORPUS-scale work is building the word-frequency table — one
  distributed ``explode → groupBy(word)`` shuffle, exactly the shape of
  every other corpus rollup here. The merge loop then runs over the
  BOUNDED vocabulary (distinct words), never the corpus.
- Each merge round is ONE shuffle: the pair count is
  ``explode(adjacent pairs) → groupBy(lhs, rhs) → sum(freq)`` with
  map-side partial aggregation. The argmax carries ONE row to the
  driver (the winning merge — a model parameter, same O(k) carry rule
  as k-means centroids), and the merge application is a map-side
  Arrow-batched pandas UDF over the symbol arrays — no shuffle, the
  vocabulary never leaves the executors.
- Per-round ``localCheckpoint`` keeps the plan O(1) deep instead of
  O(n_merges) (twelve nested pandas-UDF stages would otherwise pile up
  in one lineage).

Merge semantics pinned here (both engines replay them exactly): a
single left-to-right pass over the ORIGINAL symbols of the round — a
token produced by this round's merge never re-matches within the round
(for a run of k identical pair-matches, positions 1, 3, 5, … of the
run merge). The DuckDB oracle replays the identical loop with window
functions: match positions chain into islands of consecutive indices
(gaps-and-islands), and a match merges iff its offset within the
island is even — provably the same selection as the sequential scan.

No reference analog: the reference is a CDC consumer with no text
surface; this extends the engine per the driver's north star
(BASELINE.json:6) alongside BM25 / bigram-LM / BPE-apply.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves the string
# annotations ('pd.Series') against THIS module's globals under
# `from __future__ import annotations`
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["learn_bpe_merges", "bpe_oracle_sql"]

# one adjacent-pair struct per position, entirely JVM-side
_PAIRS = (
    "explode(transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS lhs, element_at(syms, i + 1) AS rhs)))"
)


def _apply_merge(state: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """One merge round: left-to-right non-overlapping replacement of
    (lhs, rhs) in every symbol array. Map-side only — Arrow-batched
    pandas UDF, no shuffle, vocabulary stays distributed."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def merge_pair(col: pd.Series) -> pd.Series:
        out = []
        for syms in col:
            res, i, n = [], 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    res.append(lhs + rhs)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return state.withColumn("syms", merge_pair("syms"))


def learn_bpe_merges(
    words: DataFrame, n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Greedy BPE merge learning over a (word, freq) DataFrame.

    Returns the learned merge table as
    ``[(merge_rank, lhs, rhs, merged, pair_count), ...]`` — at most
    ``n_merges`` rows, fewer if the vocabulary runs out of adjacent
    pairs first. Deterministic: ties break on (lhs, rhs) ascending.
    """
    # LAZY checkpoints: each round's argmax job materializes that
    # round's checkpoint as a side effect, so a round costs ONE job
    # (pair-count shuffle + argmax) instead of two, while the plan
    # still stays O(1) deep across rounds.
    state = words.select(
        "word",
        F.col("freq").cast("long").alias("freq"),
        F.expr("regexp_extract_all(word, '.', 0)").alias("syms"),
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            state.filter(F.size("syms") >= 2)
            .select("freq", F.expr(_PAIRS).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .first()
        )
        if best is None:
            break
        lhs, rhs = best["lhs"], best["rhs"]
        merges.append((rank, lhs, rhs, lhs + rhs, int(best["pair_count"])))
        state = _apply_merge(state, lhs, rhs).localCheckpoint(eager=False)
    return merges


def bpe_oracle_sql(n_merges: int, word_filter: str) -> str:
    """DuckDB replay of the identical greedy loop, unrolled to
    ``n_merges`` rounds of CTEs.

    Per round K: ``pK`` counts adjacent pairs, ``bK`` is the argmax
    (same tie-break), ``eK`` marks match positions against bK, ``sK``
    selects every other match within each island of consecutive
    matches (== the sequential left-to-right scan), ``wK`` rebuilds
    the arrays. All CTEs referenced more than once are MATERIALIZED
    (binder inlining would re-expand the chain combinatorially). An
    exhausted vocabulary yields an empty bK whose NULL scalar
    subqueries are COALESCEd so every later round degenerates to a
    no-op — matching the Spark loop's early break.
    """
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         regexp_extract_all(word, '.') AS syms
  FROM (SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents)
  WHERE {word_filter}
  GROUP BY word
)"""
    ]
    for k in range(1, n_merges + 1):
        j = k - 1
        parts.append(f"""p{k} AS MATERIALIZED (
  SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM w{j}, UNNEST(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2
)""")
        parts.append(f"""b{k} AS MATERIALIZED (
  SELECT CAST({k} AS INTEGER) AS merge_rank, lhs, rhs,
         lhs || rhs AS merged, pair_count
  FROM p{k} ORDER BY pair_count DESC, lhs, rhs LIMIT 1
)""")
        parts.append(f"""e{k} AS MATERIALIZED (
  SELECT word, freq, i, syms[i] AS sym,
         COALESCE(i < len(syms)
                  AND syms[i] = (SELECT lhs FROM b{k})
                  AND syms[i + 1] = (SELECT rhs FROM b{k}), false) AS m
  FROM w{j}, UNNEST(range(1, len(syms) + 1)) AS t(i)
)""")
        parts.append(f"""s{k} AS MATERIALIZED (
  SELECT *, m AND ((i - MIN(i) OVER (PARTITION BY word, isl)) % 2 = 0) AS sel
  FROM (SELECT *, CASE WHEN m THEN i - ROW_NUMBER()
                         OVER (PARTITION BY word, m ORDER BY i) END AS isl
        FROM e{k})
)""")
        parts.append(f"""w{k} AS MATERIALIZED (
  SELECT word, freq,
         list(CASE WHEN sel THEN sym || nxt ELSE sym END ORDER BY i) AS syms
  FROM (SELECT *,
               COALESCE(LAG(sel) OVER (PARTITION BY word ORDER BY i),
                        false) AS psel,
               LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
        FROM s{k})
  WHERE NOT psel
  GROUP BY word, freq
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM b{k}" for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union
