"""Text primitives shared by the text-analysis and dedup operators.

Tokenization convention (shared with every oracle): split on single spaces —
the corpus is single-space separated. All primitives are JVM-side column
expressions (no Python UDFs in the hot path); the n-gram builder uses
higher-order array functions so whole-stage codegen keeps the pipeline fused.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small English stopword list used for quality scoring and language ID.
#: Frozen: the oracle SQL embeds the same list, so never reorder silently.
STOPWORDS_EN = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "on")

#: Marker words per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "que", "de", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "une", "des"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space convention)."""
    return F.split(text, " ")


def ngrams(toks: Column, n: int) -> Column:
    """Token n-gram shingles as space-joined strings; empty array when the
    document has fewer than ``n`` tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def count_in(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in a fixed word set (JVM-side lambda filter)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def word_token_count(text: Column) -> Column:
    """BPE-ish token proxy: count of letter/digit runs plus standalone
    punctuation marks (regexp-based, engine-portable)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), 0))


def md5_bucket(word: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first 8 md5 hex chars as an integer,
    mod ``n_buckets`` — deterministic and non-negative (32-bit magnitude,
    no sign wrap), restated in DuckDB as
    ``CAST(('0x' || substr(md5(w),1,8)) AS BIGINT) % n``. The single
    md5-bucket definition shared by the frozen quality model's feature
    space and the DSIR hashed-n-gram buckets; Spark ML's HashingTF
    (murmur3, JVM-seeded) is NOT restatable in DuckDB, which would leave
    any consumer un-oracle-checkable."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long") % n_buckets


def sql_md5_bucket(expr: str, n_buckets: int) -> str:
    """DuckDB twin of :func:`md5_bucket`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) % {n_buckets}"
