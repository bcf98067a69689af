"""Corpus-curation queries: the pipeline stage AFTER dedup/scoring.

A training-data build ends with four mechanical ops the rest of this
package doesn't cover: deterministic train/holdout splitting, stratified
per-source sampling, the quality-filter funnel (which stage dropped each
doc), and packing docs into token-budget shards. All are pure Column
expressions; every randomness source is an md5 hash of a stable key, so
the DuckDB oracle replays the "random" choices bit-identically (same
convention as queries/llm_dedup.py).

Scale notes (100 TB):
- split/funnel are embarrassingly parallel scans (no shuffle beyond the
  final tiny aggregate);
- stratified sampling and shard packing use a window per stratum — one
  hash shuffle on ``source``; a hot stratum is an AQE-skew key. At real
  corpus scale you'd sub-salt the stratum and sample per salt, then
  re-rank the union (bounded rows); the per-stratum window here keeps
  the oracle exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_cdc_spark.functions.text import quality_features, token_count, tokens
from python_cdc_spark.io import table
from python_cdc_spark.queries.llm_text import _SQL_TOKS  # noqa: F401 — shared dialect fragment
from python_cdc_spark.queries.registry import register
from python_cdc_spark.queries.sketches import _sql_mix32  # shared mix32 replay

# md5 of the doc key decides every "random" assignment. Hex strings are
# lowercase in both engines and fixed-width, so lexicographic compares
# and substring bucketing agree bit-for-bit.
_SPLIT_SALT = "split-v1"
_SAMPLE_SALT = "samp-v1"


def _doc_hash(salt: str) -> Column:
    return F.md5(F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string")))


def _sql_doc_hash(salt: str) -> str:
    return f"md5('{salt}' || '|' || CAST(doc_id AS VARCHAR))"


@register(
    "corpus_split_train_holdout",
    oracle=f"""
    WITH t AS (
      SELECT lang, length(text) AS n_chars,
             substr({_sql_doc_hash(_SPLIT_SALT)}, 1, 2) AS h2
      FROM documents
    )
    SELECT CASE WHEN h2 < 'cd' THEN 'train'
                WHEN h2 < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM t
    GROUP BY 1, 2
    """,
    doc="curation: deterministic 80/10/10 train/val/test split — "
    "membership is a pure function of doc_id (md5 bucket), so the split "
    "is stable across runs, cluster sizes, and re-partitioning",
)
def corpus_split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split: first hex byte of md5(salt|doc_id) buckets each doc
    into train (< 0xcd, ~80.1%), val (< 0xe6, ~9.8%), test (rest).
    No RNG, no shuffle for the assignment itself — the only exchange is
    the final (split, lang) aggregate, which is O(#groups)."""
    d = table(spark, sf_dir, "documents")
    h2 = F.substring(_doc_hash(_SPLIT_SALT), 1, 2)
    split = (
        F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"), "lang", F.length("text").cast("long").alias("n_chars")
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
        )
    )


@register(
    "corpus_stratified_sample",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_sql_doc_hash(_SAMPLE_SALT)}, doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT source, doc_id, sample_rank FROM r WHERE sample_rank <= 10
    """,
    doc="curation: uniform-without-replacement sample of 10 docs per "
    "source stratum, deterministic via md5 ordering (reproducible "
    "eval-set carving)",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sample: rank docs inside each source by
    md5(salt|doc_id) (a uniform permutation independent of storage
    order) and keep the first 10. One shuffle on ``source``; the rank
    window never materializes more than a stratum per task."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_doc_hash(_SAMPLE_SALT), "doc_id")
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 10)
    )


@register(
    "corpus_weighted_mixture",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(regexp_replace(source, 'src', '') AS INTEGER) % 3 AS tier,
             substr({_sql_doc_hash("mix-v1")}, 1, 4) AS h4
      FROM documents
    )
    SELECT source,
           CAST(CASE tier WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END
                AS DOUBLE) AS target_rate,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN tier = 0 OR (tier = 1 AND h4 < '8000')
                          OR (tier = 2 AND h4 < '4000')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN tier = 0 OR (tier = 1 AND h4 < '8000')
                          OR (tier = 2 AND h4 < '4000')
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS kept_frac
    FROM t GROUP BY source, tier
    """,
    doc="curation: mixture weighting — per-source sampling rates "
    "(upsample scarce sources, downsample bulk crawl) applied as a "
    "deterministic hash threshold; reports achieved vs target rate",
)
def corpus_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture downsampling: each source tier keeps docs whose
    md5 prefix falls under the tier's hex threshold (1.0 / 0.5 / 0.25).
    Membership is a pure row-local hash predicate — no shuffle before
    the final per-source aggregate, and the same doc survives any
    re-run, repartition, or engine swap."""
    d = table(spark, sf_dir, "documents")
    tier = (
        F.regexp_replace("source", "src", "").cast("int") % 3
    ).alias("tier")
    h4 = F.substring(_doc_hash("mix-v1"), 1, 4)
    keep = (
        (F.col("tier") == 0)
        | ((F.col("tier") == 1) & (h4 < "8000"))
        | ((F.col("tier") == 2) & (h4 < "4000"))
    )
    rate = (
        F.when(F.col("tier") == 0, F.lit(1.0))
        .when(F.col("tier") == 1, F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    return (
        d.select("source", tier, keep.cast("int").alias("k"))
        .groupBy("source", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("k").alias("n_kept"),
        )
        .select(
            "source",
            rate.alias("target_rate"),
            "n_total",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_total")).alias("kept_frac"),
        )
    )


@register(
    "corpus_quality_funnel",
    oracle=f"""
    WITH t AS (
      SELECT source, {_SQL_TOKS} AS w FROM documents
    ), s AS (
      SELECT source,
             CASE WHEN len(w) < 20 THEN 'too_short'
                  WHEN len(w) > 90 THEN 'too_long'
                  WHEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w) < 0.35
                    THEN 'low_diversity'
                  ELSE 'kept' END AS stage
      FROM t
    )
    SELECT source, stage, COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY source) AS source_frac
    FROM s
    GROUP BY source, stage
    """,
    doc="curation: quality-filter funnel — attributes every dropped doc "
    "to the FIRST failing filter stage (length bounds, lexical "
    "diversity), per source, with in-source fractions",
)
def corpus_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attribution: each doc lands in the first stage that
    rejects it (too_short → too_long → low_diversity) or 'kept'. The
    stage expression is a single scan; the per-source fraction reuses
    the aggregate via a window over the tiny grouped result."""
    d = table(spark, sf_dir, "documents").select(
        "source", "text", tokens(F.col("text")).alias("__toks")
    )
    toks = F.col("__toks")
    qf = quality_features(F.col("text"), toks=toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    stage = (
        F.when(qf["n_tokens"] < 20, "too_short")
        .when(qf["n_tokens"] > 90, "too_long")
        .when(ttr < 0.35, "low_diversity")
        .otherwise("kept")
    )
    grouped = (
        d.select("source", stage.alias("stage"))
        .groupBy("source", "stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("source")
    return grouped.select(
        "source",
        "stage",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("source_frac"),
    )


@register(
    "corpus_pack_shards",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id, len({_SQL_TOKS}) AS n_tok FROM documents
    ), r AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tok AS tok_offset
      FROM t
    )
    SELECT source,
           CAST(FLOOR(CAST(tok_offset AS DOUBLE) / 512) AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
    FROM r
    GROUP BY 1, 2
    """,
    doc="curation: pack docs into ~512-token training shards by "
    "cumulative token offset within each source (deterministic "
    "sequence-packing assignment)",
)
def corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard packing: a doc's shard is floor(token_offset / 512) where
    token_offset is the running token count of all earlier docs (by
    doc_id) in its source — the assignment a sequential packer writing
    512-token shards would produce, computed as one window + one
    aggregate. Integer token counts keep both engines exact; the
    offsets (≪ 2^53) are exact in the double floor-division."""
    d = table(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_off = d.select("source", "doc_id", n_tok.alias("n_tok")).withColumn(
        "tok_offset", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    shard = F.floor(F.col("tok_offset").cast("double") / 512).cast("long")
    return (
        with_off.select("source", shard.alias("shard"), "n_tok")
        .groupBy("source", "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("shard_tokens"))
    )


_DECON_K = 8
_SQL_GRAMS_K = (
    f"CASE WHEN len(w) >= {_DECON_K} THEN "
    f"list_transform(generate_series(1, len(w) - {_DECON_K - 1}), "
    "i -> " + " || ' ' || ".join(f"w[i+{j}]" for j in range(_DECON_K)) + ") "
    "ELSE [] END"
)


@register(
    "corpus_decontaminate_holdout",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, substr({_sql_doc_hash(_SPLIT_SALT)}, 1, 2) AS h2,
             {_SQL_TOKS} AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, h2, UNNEST({_SQL_GRAMS_K}) AS gram FROM t
    ),
    train_grams AS (SELECT DISTINCT gram FROM g WHERE h2 < 'cd'),
    test_grams AS (
      SELECT DISTINCT doc_id, gram FROM g WHERE h2 >= 'e6'
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM test_grams GROUP BY doc_id
    ),
    shared AS (
      SELECT tg.doc_id, COUNT(*) AS n_shared
      FROM test_grams tg JOIN train_grams USING (gram)
      GROUP BY tg.doc_id
    )
    SELECT p.doc_id,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(p.n_grams AS BIGINT) AS n_grams,
           CAST(s.n_shared AS DOUBLE) / p.n_grams AS contamination
    FROM per_doc p JOIN shared s USING (doc_id)
    """,
    doc=f"curation: holdout decontamination — test-split docs sharing "
    f"{_DECON_K}-gram fingerprints with ANY train doc (the leakage check "
    "run before any eval on held-out data)",
)
def corpus_decontaminate_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage detection the way LLM data pipelines do it:
    explode each doc into 8-gram fingerprints, reuse the deterministic
    hash split, and semi-join the holdout's grams against the distinct
    train-gram set. Scale shape: the gram explode is the only wide
    stage; the join is keyed on the gram string (train side distinct —
    at 100 TB you'd bucket it by gram hash and this join is
    exchange-free on re-use). Output: contaminated test docs with
    shared-gram counts and ratio."""
    d = table(spark, sf_dir, "documents")
    h2 = F.substring(_doc_hash(_SPLIT_SALT), 1, 2)
    toks = d.select("doc_id", h2.alias("h2"), tokens(F.col("text")).alias("w"))
    grams = toks.filter(F.size("w") >= _DECON_K).select(
        "doc_id",
        "h2",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - _DECON_K),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("w", (i + j + 1).cast("int")) for j in range(_DECON_K)]
                ),
            )
        ).alias("gram"),
    )
    train_grams = grams.filter(F.col("h2") < "cd").select("gram").distinct()
    test_grams = grams.filter(F.col("h2") >= "e6").select("doc_id", "gram").distinct()
    per_doc = test_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        test_grams.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return per_doc.join(shared, "doc_id").select(
        "doc_id",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("n_grams").cast("long").alias("n_grams"),
        (F.col("n_shared").cast("double") / F.col("n_grams")).alias("contamination"),
    )


_CHUNK_WINDOW, _CHUNK_STRIDE = 32, 24


@register(
    "corpus_chunk_sliding",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    s AS (
      SELECT doc_id, w, UNNEST(generate_series(0, len(w) - 1, {_CHUNK_STRIDE})) AS start
      FROM t WHERE len(w) > 0
    )
    SELECT doc_id,
           CAST(start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(w, start + 1, start + {_CHUNK_WINDOW})) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(w, start + 1, start + {_CHUNK_WINDOW}), ' ') AS chunk_text
    FROM s
    """,
    doc=f"corpus curation: sliding-window chunker — {_CHUNK_WINDOW}-token "
    f"windows at stride {_CHUNK_STRIDE} ({_CHUNK_WINDOW - _CHUNK_STRIDE}-token "
    "overlap), the RAG/pretraining context-window prep op",
)
def corpus_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into fixed token windows with overlap — the
    mechanical prep step before embedding (RAG) or sequence packing
    (pretraining). One row per (doc, window start); the trailing window
    is shorter (standard sliding-window semantics — downstream packing
    re-pads). Pure column expressions: tokenize once, explode the
    bounded start sequence, slice — one scan, the explode fan-out is
    len/stride (~2-3× rows here), no UDF, no shuffle. At 100 TB this is
    the shape you want: chunking is map-only and parallelizes with the
    input splits."""
    # tokenize once into a projected column: the start sequence and the
    # carried window array both reference the token array (the generator
    # expression would otherwise re-tokenize for each)
    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("w")
    )
    n = F.size(F.col("w"))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE))
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice("w", F.col("start") + 1, _CHUNK_WINDOW)
    return (
        d.select("doc_id", "w", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def _sql_pipeline_oracle() -> str:
    from python_cdc_spark.queries.llm_dedup import _VERIFIED_PAIRS_CTES

    return f"""
    WITH RECURSIVE {_VERIFIED_PAIRS_CTES},
    q AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source, text, {_SQL_TOKS} AS w FROM documents
      ) WHERE len(w) BETWEEN 20 AND 90
          AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.35
    ),
    ex AS (
      SELECT doc_id, source, w FROM (
        SELECT doc_id, source, w,
               MIN(doc_id) OVER (
                 PARTITION BY sha256(list_aggregate(w, 'string_agg', ' '))
               ) AS exact_canon
        FROM q
      ) WHERE doc_id = exact_canon
    ),
    p2 AS (
      SELECT p.id_a, p.id_b FROM pairs p
      JOIN ex a ON a.doc_id = p.id_a
      JOIN ex b ON b.doc_id = p.id_b
    ),
    sym AS (
      SELECT id_a AS a, id_b AS b FROM p2
      UNION
      SELECT id_b AS a, id_a AS b FROM p2
    ),
    reach(v, l) AS (
      SELECT DISTINCT a, a FROM sym
      UNION
      SELECT s.a, r.l FROM sym s JOIN reach r ON r.v = s.b
    ),
    comp AS (SELECT v, MIN(l) AS component FROM reach GROUP BY v),
    survivors AS (
      SELECT e.doc_id, e.source, len(e.w) AS n_tok
      FROM ex e LEFT JOIN comp c ON c.v = e.doc_id
      WHERE COALESCE(c.component, e.doc_id) = e.doc_id
    )
    SELECT CASE WHEN h2 < 'cd' THEN 'train'
                WHEN h2 < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM (
      SELECT source, n_tok, substr({_sql_doc_hash(_SPLIT_SALT)}, 1, 2) AS h2
      FROM survivors
    )
    GROUP BY 1, 2
    """


@register(
    "corpus_curation_pipeline",
    oracle=_sql_pipeline_oracle(),
    doc="curation FLAGSHIP: the whole training-data build as ONE plan — "
    "quality gate -> exact dedup -> near-dup components -> hash split "
    "-> per-(split, source) corpus manifest",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build, composed from the package's own stages
    so Catalyst optimizes ACROSS stage boundaries (one logical plan, no
    intermediate materialization the user has to manage):

    1. quality gate — the funnel's keep rule (token bounds + lexical
       diversity), a map-only scan;
    2. exact dedup among survivors — min-doc_id canonical per
       normalized-content sha256 (one hash window; a no-op on corpora
       without exact copies, semantically present regardless);
    3. near-dup dedup — banded-LSH verified pairs with BOTH endpoints
       restricted to the surviving set (pair existence is per-doc-pair,
       so post-filtering equals recomputing among survivors; the
       restriction happens BEFORE the closure, so a dropped middle doc
       no longer bridges two clusters), then connected components,
       keep = component minimum;
    4. deterministic md5 split and the (split, source) manifest with
       exact integer token totals.

    Scale: stages 1-2 are scan + one hash window; stage 3 is the
    bounded candidate-pair pipeline (never all-pairs) + the iterative
    closure whose edge set is the verified pairs only; the manifest is
    a tiny aggregate. Every stage reuses the operator the registry
    gates individually — this row proves the composition."""
    survivors = curation_survivors(spark, sf_dir)
    return (
        survivors.select("split", "source", "n_tok")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )


def curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's survivor set with split assignment — shared by
    the registered manifest query and the `curate` CLI, which
    materializes the corpus itself (doc rows, not just counts)."""
    from python_cdc_spark.functions.text import normalized_text, tokens as _toks
    from python_cdc_spark.operators.components import connected_components
    from python_cdc_spark.queries.llm_dedup import lsh_verified_pairs

    d = table(spark, sf_dir, "documents")
    toks = _toks(F.col("text"))
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    q = d.filter(
        F.size(toks).between(20, 90) & (ttr >= 0.35)
    ).select(
        "doc_id",
        "source",
        "lang",
        "text",
        F.size(toks).cast("long").alias("n_tok"),
        F.sha2(normalized_text(F.col("text")), 256).alias("h"),
    )
    w = Window.partitionBy("h")
    ex = (
        q.withColumn("exact_canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("exact_canon"))
        .drop("h", "exact_canon")
        .localCheckpoint(eager=False)  # feeds the pair filter AND the output
    )
    pairs = lsh_verified_pairs(spark, sf_dir).select("id_a", "id_b")
    ids_a = ex.select(F.col("doc_id").alias("id_a"))
    ids_b = ex.select(F.col("doc_id").alias("id_b"))
    p2 = pairs.join(ids_a, "id_a", "left_semi").join(ids_b, "id_b", "left_semi")
    comp = connected_components(p2, "id_a", "id_b")
    h2 = F.substring(_doc_hash(_SPLIT_SALT), 1, 2)
    split = F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    return (
        ex.join(comp, ex["doc_id"] == comp["v"], "left")
        .filter(F.coalesce(F.col("component"), F.col("doc_id")) == F.col("doc_id"))
        .select(split.alias("split"), "doc_id", "source", "lang", "text", "n_tok")
    )


@register(
    "corpus_shuffle_epochs",
    oracle=f"""
    WITH e(epoch) AS (VALUES (0), (1)),
    r AS (
      SELECT e.epoch, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY e.epoch
               ORDER BY md5('ep' || CAST(e.epoch AS VARCHAR) || '|'
                            || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS position
      FROM documents d CROSS JOIN e
    )
    SELECT CAST(epoch AS INTEGER) AS epoch, doc_id,
           CAST(position AS BIGINT) AS position,
           CAST((position - 1) // 64 AS BIGINT) AS micro_batch
    FROM r
    """,
    doc="curation: deterministic per-epoch training order — each epoch "
    "is an independent md5 permutation of the corpus, with micro-batch "
    "assignment; reshuffling is a pure function of (epoch, doc_id)",
)
def corpus_shuffle_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order generation: epoch e's order is the rank of
    md5('ep<e>|doc_id') — a uniform permutation that is a pure function
    of (epoch, doc_id), so any worker can recompute any epoch's order
    without coordination, resume mid-epoch, or verify a shard against
    the manifest. The global rank is ONE sort per epoch; at real scale
    you shard first (corpus_pack_shards) and rank within shard so no
    global ordering exists — the same expression with a PARTITION BY
    shard. Micro-batches fall out of integer division of the rank."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    w = Window.partitionBy("epoch").orderBy(
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ),
        "doc_id",
    )
    return (
        d.crossJoin(F.broadcast(epochs))
        .select("epoch", "doc_id", F.row_number().over(w).cast("long").alias("position"))
        .withColumn("micro_batch", F.expr("(position - 1) DIV 64"))
    )


@register(
    "corpus_split_chisquare",
    oracle=f"""
    WITH t AS (
      SELECT CASE WHEN substr({_sql_doc_hash(_SPLIT_SALT)}, 1, 2) < 'cd'
                  THEN 'train'
                  WHEN substr({_sql_doc_hash(_SPLIT_SALT)}, 1, 2) < 'e6'
                  THEN 'val' ELSE 'test' END AS split,
             {_SQL_TOKS} AS w
      FROM documents
    ),
    o AS (
      SELECT split, unnest(w) AS token FROM t
    ),
    obs AS (
      SELECT split, token, CAST(COUNT(*) AS BIGINT) AS o
      FROM o GROUP BY 1, 2
    ),
    split_tot AS (
      SELECT split, CAST(SUM(o) AS BIGINT) AS n_s FROM obs GROUP BY 1
    ),
    tok_tot AS (
      SELECT token, CAST(SUM(o) AS BIGINT) AS c_w FROM obs GROUP BY 1
    ),
    grand AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    terms AS (
      SELECT obs.split,
             obs.o,
             CAST(split_tot.n_s AS DOUBLE) * tok_tot.c_w / grand.n AS e
      FROM obs
      JOIN split_tot USING (split)
      JOIN tok_tot USING (token)
      CROSS JOIN grand
    )
    SELECT split,
           CAST(SUM(o) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types_observed,
           CAST(ROUND(SUM(CAST(
             (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
             AS DECIMAL(30,10))), 4) AS DOUBLE) AS chi2_contrib
    FROM terms GROUP BY split
    """,
    doc="curation/diagnostics: chi-square drift between the md5 "
    "train/val/test splits' token distributions — per-split sum of "
    "(observed - expected)^2 / expected against the pooled "
    "distribution; the leakage/skew check run before a split ships",
)
def corpus_split_chisquare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between splits without any sampling: observed
    (split, token) counts are one hash aggregate; expected counts
    derive from two tiny keyed joins (split totals broadcast, token
    totals co-keyed with the obs table); the statistic decimal-routes
    its sum so Spark's parallel partial aggregation matches DuckDB's
    sequential one bit-for-bit. Per-term arithmetic is doubles from
    integer counts — identical IEEE ops both engines. A healthy random
    split has chi2 ≈ df; a contaminated or topic-skewed split explodes
    it. At 100 TB the wide exchanges are the two token aggregates —
    both map-side combinable."""
    from python_cdc_spark.functions.text import tokens as _tokens

    d = table(spark, sf_dir, "documents")
    h2 = F.substring(_doc_hash(_SPLIT_SALT), 1, 2)
    split = F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test")
    o = d.select(split.alias("split"), F.explode(_tokens(F.col("text"))).alias("token"))
    obs = (
        o.groupBy("split", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=False)  # three aggregate consumers
    )
    split_tot = obs.groupBy("split").agg(F.sum("o").cast("long").alias("n_s"))
    tok_tot = obs.groupBy("token").agg(F.sum("o").cast("long").alias("c_w"))
    grand = obs.agg(F.sum("o").cast("long").alias("n"))
    e = F.col("n_s").cast("double") * F.col("c_w") / F.col("n")
    od = F.col("o").cast("double")
    terms = (
        obs.join(F.broadcast(split_tot), "split")
        .join(tok_tot, "token")
        .crossJoin(F.broadcast(grand))
        .select("split", "o", e.alias("e"))
    )
    from python_cdc_spark.queries.helpers import dec_sum

    return terms.groupBy("split").agg(
        F.sum("o").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types_observed"),
        dec_sum((od - F.col("e")) * (od - F.col("e")) / F.col("e"), "chi2_contrib"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (priority sampling)
# ---------------------------------------------------------------------------
# Duffield–Lund–Thorup priority sampling: each item draws a uniform
# u_i ∈ (0, 1] and gets priority q_i = w_i / u_i; the sample is the k
# largest priorities and τ is the (k+1)-th, giving the unbiased
# subset-sum estimator ŵ_i = max(w_i, τ). The uniform is the shared
# mix32 hash of doc_id, so both engines draw the SAME u_i, and every
# arithmetic step is a single IEEE-exact (or correctly-rounded)
# operation: w·2³² is an exact double for w < 2²¹, and one division is
# correctly rounded identically everywhere — no pow/ln, which would NOT
# be bit-stable cross-engine (that is why this is priority sampling and
# not Efraimidis–Spirakis u^(1/w)).
_PRIO_K = 16


@register(
    "corpus_sample_weighted_priority",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars AS weight,
             CAST(n_chars AS DOUBLE) * 4294967296.0
               / CAST({_sql_mix32("doc_id")} + 1 AS DOUBLE) AS priority
      FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    top AS (
      SELECT doc_id, weight, priority,
             CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
                  AS INTEGER) AS sample_rank
      FROM t ORDER BY priority DESC, doc_id LIMIT {_PRIO_K + 1}
    ),
    tau AS (
      SELECT coalesce(
               max(CASE WHEN sample_rank = {_PRIO_K + 1} THEN priority END),
               0.0) AS tau
      FROM top
    )
    SELECT sample_rank, doc_id, CAST(weight AS BIGINT) AS weight, priority,
           greatest(CAST(weight AS DOUBLE), tau.tau) AS est_weight
    FROM top, tau
    WHERE sample_rank <= {_PRIO_K}
    """,
    doc="LLM curation: weight-proportional sample without replacement "
    "(priority sampling) with the Horvitz-Thompson-style max(w, tau) "
    "estimator — the length-balanced mixture draw a training build "
    "uses where Bernoulli rates over- or under-shoot small strata.",
)
def corpus_sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample: u_i = (mix32(doc_id)+1)/2^32,
    q_i = weight/u_i, keep the top-``_PRIO_K`` priorities, τ = the
    (k+1)-th. Scale shape: priorities are a map-side projection; the
    top-(k+1) is ``TakeOrderedAndProject`` — per-partition heaps merged
    on the driver, never a full sort or shuffle of the corpus; τ rides
    back as a broadcast one-row join. Estimator property (why this and
    not per-stratum rank sampling): Σ max(w_i, τ) over the sample is an
    unbiased estimate of Σ w_i, so downstream token-budget accounting
    can use the sample alone."""
    from python_cdc_spark.queries.sketches import _mix32

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
        .select("doc_id", F.col("n_chars").alias("weight"))
    )
    prio = (
        F.col("weight").cast("double")
        * F.lit(4294967296.0)
        / (_mix32(F.col("doc_id")) + F.lit(1)).cast("double")
    )
    top = (
        d.select("doc_id", "weight", prio.alias("priority"))
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(_PRIO_K + 1)
    )
    w = Window.orderBy(F.desc("priority"), F.asc("doc_id"))
    ranked = top.select(
        F.row_number().over(w).cast("int").alias("sample_rank"),
        "doc_id",
        F.col("weight").cast("long").alias("weight"),
        "priority",
    )
    # τ falls back to 0.0 when the corpus has ≤ k rows (no (k+1)-th
    # priority exists): the aggregate always yields ONE row, so a tiny
    # corpus returns the full population with est_weight = weight
    # instead of silently dropping everything on an empty cross join
    # (ADVICE r9). max(w, 0) = w, so the estimator is unchanged.
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("sample_rank") == _PRIO_K + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    return (
        ranked.filter(F.col("sample_rank") <= _PRIO_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "sample_rank",
            "doc_id",
            "weight",
            "priority",
            F.greatest(F.col("weight").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )
