"""Training-data curation operators (north-star LLM-pipeline ops, no
reference citation — SURVEY §2.12 extensions): deterministic dataset
splitting, token-window chunking, and benchmark decontamination.

These are the steps between "raw corpus" and "training batches" that a
100 TB pipeline runs after dedup/quality gating:

- ``documents_hash_split``: train/val/test assignment must be DETERMINISTIC
  and data-local (a pure function of the document key) — never `rand()`,
  which reshuffles membership across runs and executors. md5 is the
  oracle-parity hash (identical builtin in Spark and DuckDB); at scale the
  same pattern runs on xxhash64 for one fewer string materialization.
- ``docs_chunk_for_training``: fixed token windows with overlap (stride <
  window), the standard packing prep for LM training. Pure Catalyst
  sequence/slice HOFs — a narrow fan-out, no shuffle, no UDF.
- ``decontaminate_ngram_overlap``: flag corpus documents sharing any word
  n-gram with a benchmark set (here: the doc_id < BENCH_MAX_DOC_ID slice
  as a stand-in). The benchmark side is tiny by construction, so the join
  broadcasts — the corpus never shuffles; this is the canonical
  eval-contamination sweep shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams
from ..registry import query
from ..sources import load_table

TRAIN_PCT = 80  # bucket < 80 -> train
VAL_PCT = 90  # 80 <= bucket < 90 -> val; else test

CHUNK_TOKENS = 64
CHUNK_STRIDE = 56  # 8-token overlap between consecutive chunks

DECON_NGRAM = 5
BENCH_MAX_DOC_ID = 100  # doc_id < this = the stand-in benchmark set


def hash_bucket(col: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) bucket from the md5 of a key column —
    stable across runs, executors, and engines (DuckDB computes the
    identical value, which is what makes the split oracle-checkable)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


@query(
    "documents_hash_split",
    f"""
    WITH b AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   % 100 AS bucket,
               length(text) AS n_chars
        FROM documents
    )
    SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY split
    """,
)
def documents_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the corpus keyed on
    md5(doc_id) — membership is reproducible from the key alone."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), F.length("text").alias("n_chars"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "docs_chunk_for_training",
    f"""
    WITH toked AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS toks
        FROM documents
    ),
    starts AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE})) AS st
        FROM toked
    )
    SELECT doc_id,
           CAST(st / {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(len(toks[st + 1 : least(st + {CHUNK_TOKENS}, len(toks))])
                AS INT) AS n_tokens,
           md5(list_aggregate(
               toks[st + 1 : least(st + {CHUNK_TOKENS}, len(toks))],
               'string_agg', ' ')) AS chunk_md5
    FROM starts
    """,
)
def docs_chunk_for_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan every document out into {CHUNK_TOKENS}-token windows advancing
    by {CHUNK_STRIDE} (8-token overlap). chunk_md5 checksums the exact
    chunk text so the oracle pins content, not just counts. Narrow plan:
    tokenize -> sequence/explode -> slice, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens("text").alias("toks"))
    starts = toked.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            )
        ).alias("st"),
    )
    chunk = F.slice("toks", F.col("st") + 1, CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        (F.col("st") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH toked AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS toks
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                   [list_aggregate(toks[i:i+{DECON_NGRAM - 1}], 'string_agg', ' ')
                    for i in range(1, len(toks) - {DECON_NGRAM - 2})])) AS s
        FROM toked
        WHERE len(toks) >= {DECON_NGRAM}
    ),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < {BENCH_MAX_DOC_ID}),
    corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= {BENCH_MAX_DOC_ID})
    SELECT c.doc_id, count(*) AS n_shared_ngrams
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination sweep: corpus documents sharing at least one
    word {DECON_NGRAM}-gram with the benchmark slice, with the count of
    shared distinct n-grams. The benchmark n-gram set is DISTINCT'd and
    broadcast (benchmark << corpus at scale), so the corpus side is a
    narrow scan + broadcast-hash semi-shape: no corpus shuffle except the
    final per-doc count."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens("text").alias("toks"))
    sh = toked.filter(F.size("toks") >= DECON_NGRAM).select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(word_ngrams(F.col("toks"), DECON_NGRAM))
        ).alias("s"),
    )
    bench = (
        sh.filter(F.col("doc_id") < BENCH_MAX_DOC_ID)
        .select(F.md5("s").alias("h"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= BENCH_MAX_DOC_ID).select(
        "doc_id", F.md5("s").alias("h")
    )
    return (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
