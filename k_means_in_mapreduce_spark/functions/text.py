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
    return F.trim(F.regexp_replace(F.lower(_col(text)), "[ \\t\\n\\x0B\\f\\r]+", " "))


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalized(text), " ")


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


# chars NOT counted as punctuation by the quality gate; whitespace stays
# in the explicit cross-engine class form (see normalized()).
NON_PUNCT_CLASS = "[a-z0-9 \\t\\n\\x0B\\f\\r]"


def punct_ratio(text: ColumnOrName) -> Column:
    """Fraction of characters that are neither alphanumeric nor
    whitespace — THE shared quality-gate expression (text_quality and
    pipeline_training_corpus must stay in lockstep; SQL twin:
    text_analysis._PUNCT_SQL)."""
    t = _col(text)
    return (
        F.length(F.regexp_replace(F.lower(t), NON_PUNCT_CLASS, "")).cast("double")
        / F.length(t)
    )


def stopword_ratio(toks: Column, stopwords) -> Column:
    """Fraction of tokens in the stopword list (SQL twin:
    text_analysis._SW_RATIO_SQL)."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    return (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
        / F.size(toks)
    )


def md5_fingerprint(text: ColumnOrName) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized text.
    Oracle-parity: DuckDB md5() produces the identical hex string."""
    return F.md5(normalized(text))
