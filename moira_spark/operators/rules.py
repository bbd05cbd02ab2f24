"""Native Column-expression rules (whole-stage codegen, no Python).

These are the cheap gates (moira's length/ambig checks [M] → length and
symbol-ratio rules).  They MUST be bit-identical with the pandas kernels in
``kernels.text`` — both sides use explicit ASCII character classes because
Java regex ``\\s``/``\\p{Alnum}`` are ASCII-only (see kernels/text.py
docstring).  Equivalence is pinned by tests/test_pipeline.py.

Keeping these as Column exprs (rather than folding them into the Arrow UDF)
matters at scale: they run inside WholeStageCodegen on the JVM, and filters
derived from them can be evaluated before any Python worker is involved.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from moira_spark import config

_ASCII_WS_CLASS = "[ \t\n\x0b\f\r]"
# All chars that do NOT count as symbols, as a literal list for translate().
# Java regex NEGATED character classes fall off the Pattern fast path and
# cost ~25x (measured 8.4s vs 0.3s on the 200k-turn bench table), so symbol
# counting deletes the alnum/ws chars via translate (a per-char map) and
# counts what remains — bit-identical, no regex involved.
_ALNUM_WS_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    " \t\n\x0b\f\r"
)


def text_col() -> Column:
    return F.coalesce(F.col("text"), F.lit(""))


def n_chars(c: Column | None = None) -> Column:
    return F.length(c if c is not None else text_col())


def n_words(c: Column | None = None) -> Column:
    """ASCII-whitespace tokens, empties dropped — matches kernels.text.words."""
    c = c if c is not None else text_col()
    toks = F.split(c, _ASCII_WS_CLASS + "+")
    return F.size(F.filter(toks, lambda x: x != F.lit("")))


def symbol_count(c: Column | None = None) -> Column:
    c = c if c is not None else text_col()
    # chars remaining after deleting alnum+whitespace = symbol count
    return F.length(F.translate(c, _ALNUM_WS_CHARS, ""))


def hash_ellipsis_count(c: Column | None = None) -> Column:
    c = c if c is not None else text_col()
    return F.length(c) - F.length(F.regexp_replace(c, "[#…]", ""))


def length_rule_fails() -> Column:
    chars, wrds = n_chars(), n_words()
    ok = (
        (chars >= config.MIN_CHARS)
        & (chars <= config.MAX_CHARS)
        & (wrds >= config.MIN_WORDS)
        & (wrds <= config.MAX_WORDS)
    )
    return ~ok


def symbol_rule_fails() -> Column:
    denom = F.greatest(n_words(), F.lit(1)).cast("double")
    sym_ratio = symbol_count().cast("double") / denom
    he_ratio = hash_ellipsis_count().cast("double") / denom
    return (sym_ratio > F.lit(config.MAX_SYMBOL_WORD_RATIO)) | (
        he_ratio > F.lit(config.MAX_HASH_ELLIPSIS_WORD_RATIO)
    )
