"""Text Catalyst expression builders: tokenization, shingling, hashing.

All pure built-in expressions (JVM-side, codegen'd) — the dedup / text-
analysis operators compose these; no Python UDF in any hot path. Where an
operator must be oracle-checkable, the hash used is md5 (identical builtin
in Spark and DuckDB); the scale path uses xxhash64 (Spark builtin, 64-bit,
cheaper) and is verified by recall tests instead of the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalized(text: ColumnOrName) -> Column:
    """Lowercase, collapse whitespace, strip — the canonical form used by
    fingerprints and near-dup shingling."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), "\\s+", " "))


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalized(text), " ")


def word_tokens(text: ColumnOrName) -> Column:
    """BPE-ish tokens: runs of word chars OR single non-space punctuation,
    via regexp_extract_all — closer to a subword tokenizer's pre-split."""
    return F.expr(
        f"regexp_extract_all({_sql(text)}, \"[a-z0-9']+|[^a-z0-9'\\\\s]\", 0)"
    )


def _sql(c: ColumnOrName) -> str:
    if isinstance(c, str):
        return c
    raise TypeError("word_tokens needs a column name string")


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Empty array when the document has fewer than n tokens.
    """
    upper = F.size(toks) - F.lit(n)
    return F.when(upper < 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), upper + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-gram shingles of a string column."""
    upper = F.length(text) - F.lit(n)
    return F.when(upper < 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), upper + 1),
            lambda i: F.substring(text, i, n),
        )
    )


def md5_fingerprint(text: ColumnOrName) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized text.
    Oracle-parity: DuckDB md5() produces the identical hex string."""
    return F.md5(normalized(text))
