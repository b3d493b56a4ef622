"""Deduplication operator surface (north-star LLM-pipeline ops).

Five dedup families over ``documents`` / ``embeddings``:

- exact dedup (hash groupBy) .............. ``dedup_exact`` [oracle]
- n-gram Jaccard near-dup ................. ``dedup_ngram_jaccard`` [oracle]
- MinHash + LSH banding ................... ``dedup_minhash_lsh`` [rows-only;
  recall vs the exact Jaccard baseline asserted in tests/test_dedup.py]
- SimHash ................................. ``dedup_simhash`` [rows-only;
  property-tested]
- embedding-cosine near-dup ............... ``dedup_embedding_cosine`` [oracle]

Scale design:
- Exact dedup groups by md5 of the normalized text: the shuffle key is a
  32-byte digest, not the document body; at 100 TB the full text never
  shuffles (a group-by on raw text would move the corpus).
- Jaccard candidate generation is the standard inverted-index self-join on
  shared shingles (shuffle on shingle). Hot shingles are the skew risk:
  candidates are deduped per pair before scoring, AQE skew-join handles
  stragglers, and the MinHash/LSH path replaces the exact join at scale
  (bounded signature width instead of full shingle sets).
- MinHash signatures/banding are pure Catalyst expressions on xxhash64 —
  constant-size state per doc (num_perm longs), bucket join on (band,
  bucket-hash) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalized, tokens, word_ngrams
from ..functions.vector import cosine_similarity
from ..registry import query
from ..sources import load_table

NGRAM_N = 3
JACCARD_THRESHOLD = 0.6
NUM_PERM = 64  # minhash signature width
LSH_BANDS = 16  # 16 bands x 4 rows: ~P(candidate) = 1-(1-j^4)^16
COSINE_THRESHOLD = 0.4


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_distinct(word_ngrams(tokens("text"), NGRAM_N)).alias("shingles"),
    ).filter(F.size("shingles") > 0)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY content_hash
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct normalized text,
    keeping the lowest doc_id (deterministic keeper policy)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(normalized("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup (the oracle-checkable baseline)
# ---------------------------------------------------------------------------
_JACCARD_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([list_aggregate(toks[i:i+{NGRAM_N - 1}], 'string_agg', ' ')
                              for i in range(1, len(toks) - {NGRAM_N - 2})]) AS shingles
        FROM (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        )
        WHERE len(toks) >= {NGRAM_N}
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    pair_common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
    SELECT p.doc_a, p.doc_b,
           CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard
    FROM pair_common p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) >= {JACCARD_THRESHOLD}
"""


@query("dedup_ngram_jaccard", _JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-{3}-gram Jaccard near-dup pairs >= threshold, via the
    inverted-index candidate join (docs sharing >= 1 shingle)."""
    sh = _shingled(spark, sf_dir)
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    jac = (
        pair_common.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
    )
    return jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path; approximate -> recall-tested, not oracled)
# ---------------------------------------------------------------------------
def minhash_signatures(sh: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """num_perm-wide minhash signature per doc: sig[i] = min over shingles
    of xxhash64(shingle, i). Pure expressions, O(num_perm) state per doc."""
    # NOTE: each lambda must take exactly ONE arg — a second parameter
    # (even with a default) makes Spark bind it to the array index.
    def perm_min(i: int) -> F.Column:
        return F.array_min(
            F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(i)))
        )

    sig = F.array(*[perm_min(i) for i in range(num_perm)])
    return sh.select("doc_id", sig.alias("sig"))


@query("dedup_minhash_lsh")  # approximate — recall-tested vs exact Jaccard
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: band the signature, bucket-join on
    (band, band-hash), estimate Jaccard as matching-minhash fraction, keep
    pairs >= threshold."""
    sh = _shingled(spark, sf_dir)
    sigs = minhash_signatures(sh).cache()
    rows_per_band = NUM_PERM // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig").getItem(b * rows_per_band + r)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda m: m,
                )
            ).cast("double")
            / F.lit(NUM_PERM),
        )
    )
    return est.filter(F.col("est_jaccard") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "est_jaccard"
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) — rows-only; hamming-distance property tests
# ---------------------------------------------------------------------------
@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash over word tokens: bit b of the fingerprint is the
    sign of the sum over tokens of (2*bit_b(xxhash64(token)) - 1).
    Near-dup docs have small Hamming distance between fingerprints."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens("text"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_term(b: int) -> F.Column:
        bit_sum = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )
        return (
            F.when(bit_sum > 0, F.lit(2 ** b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )

    # 63 bits keeps the fingerprint non-negative in a signed long
    bit_terms = [bit_term(b) for b in range(63)]
    simhash = bit_terms[0]
    for t in bit_terms[1:]:
        simhash = simhash + t
    return d.select("doc_id", simhash.alias("simhash"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs
# ---------------------------------------------------------------------------
@query(
    "dedup_embedding_cosine",
    f"""
    WITH dot AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               sum(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE)) AS d,
               sqrt(sum(CAST(a.embedding[t.i] AS DOUBLE) * CAST(a.embedding[t.i] AS DOUBLE))) AS na,
               sqrt(sum(CAST(b.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))) AS nb
        FROM embeddings a
        CROSS JOIN embeddings b
        CROSS JOIN range(1, 65) t(i)
        WHERE a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    )
    SELECT vec_a, vec_b, d / (na * nb) AS cos_sim
    FROM dot WHERE d / (na * nb) >= {COSINE_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine near-dup pairs over embeddings (brute-force baseline;
    the LSH path in operators/similarity.py is the scale variant)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.withColumn("cos_sim", cosine_similarity("ea", "eb"))
        .filter(F.col("cos_sim") >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", "cos_sim")
    )
