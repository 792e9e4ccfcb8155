"""Text primitives for the LLM-data-pipeline operators: normalization,
tokenization, shingling, and *engine-portable* hashing.

Portability design: every hash bottoms out in md5 of a string — md5 produces
identical hex on Spark and DuckDB, so MinHash signatures, LSH band keys,
SimHash bit vectors, and fingerprints are reproducible in the ANSI-SQL
oracle. (xxhash64/murmur would be faster but are engine-specific; at 100 TB
swap `md5_bucket`'s base hash for xxhash64 — the operator shapes are
identical.)

Everything here is a built-in Column expression — no Python UDFs, all
whole-stage-codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace runs, strip — the canonical form used
    by exact dedup and fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>, no
    empties)."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != "")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles (array<string>). Built with
    transform-over-sequence so it stays JVM-side: shingle i joins tokens
    [i, i+k) with single spaces.

    Docs shorter than k tokens yield a single shingle of the whole text
    (so every doc has ≥1 shingle and MinHash is defined everywhere).

    The token array is BOUND once per row (see ``bind``): referencing
    `tokens(col)` directly inside the per-shingle lambda re-evaluates the
    whole normalize+split pipeline for EVERY sequence element —
    O(n·|text|) per row, hours on one 1 MB document (caught by the
    maxvals degenerate layout, r10)."""

    def build(tok: Column) -> Column:
        n = F.size(tok)
        grams = F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, k)),
        )
        return F.array_distinct(
            F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", tok)))
        )

    return bind(tokens(col), build)


def bind(col: Column, fn) -> Column:
    """Let-expression idiom: evaluate ``col`` ONCE per row and pass the
    bound value into ``fn``.  Neither withColumn nor select aliases are
    evaluation barriers — CollapseProject inlines the aliased expression
    into every consumer, so referencing an expensive expression inside a
    per-element higher-order-function lambda re-evaluates it for EVERY
    element (the O(n·|text|) class the maxvals layout caught in
    word_shingles/ta04/dd20, r10).  A 1-element array transform is a real
    binder: the lambda variable holds the evaluated value."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def char_array(col: Column | str) -> Column:
    """The string as an array of single code-point strings — the O(1)-index
    representation for rolling char windows.  `substr(s, i, w)` must SCAN
    to code point i on a variable-width encoding (O(i) per call), so any
    rolling window over positions is O(L²) in string length — hours on one
    1 MB document (caught by the maxvals degenerate layout, r10); slicing
    a materialized char array is O(w) per window.  The trailing
    `F.slice(..., 1, length)` pins the element count to exactly L (Java's
    split keeps a trailing empty string under limit -1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.split(c, ""), F.lit(1), F.greatest(F.length(c), F.lit(0)))


def md5_keyed(seed: Column | str | int, value: Column) -> Column:
    """Keyed md5: md5(seed || '|' || value) — the seed turns one hash
    function into a family (MinHash permutations, LSH hyperplanes)."""
    s = F.lit(str(seed)) if isinstance(seed, int) else (F.col(seed) if isinstance(seed, str) else seed)
    return F.md5(F.concat(s.cast("string"), F.lit("|"), value))


def md5_prefix_long(value: Column, hex_chars: int = 8) -> Column:
    """First `hex_chars` hex digits of md5(value) as a non-negative long —
    the portable integer hash (DuckDB twin: the positional strpos/power
    expansion emitted by `sql_md5_prefix_long`)."""
    return F.conv(F.substring(F.md5(value), 1, hex_chars), 16, 10).cast("long")


def sql_md5_prefix_long(expr: str, hex_chars: int = 8) -> str:
    """DuckDB SQL that mirrors md5_prefix_long: decode the first
    `hex_chars` hex digits of md5(expr) positionally (DuckDB lacks a direct
    hex→int cast)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {p}, 1)) - 1) "
        f"* {16 ** (hex_chars - p)}"
        for p in range(1, hex_chars + 1)
    ]
    return "(" + " + ".join(terms) + ")"
