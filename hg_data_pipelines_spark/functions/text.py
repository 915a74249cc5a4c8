"""Text fingerprinting primitives: tokens, shingles, MinHash, SimHash.

All pure Spark SQL expressions (JVM-side, codegen-friendly) — no Python UDFs.
Hashes are ``xxhash64`` with integer seeds: deterministic across runs,
partitions, and cluster sizes, which is what makes MinHash signatures and
SimHash fingerprints reproducible at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def word_shingles(toks_col: str = "toks", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (n-gram Jaccard basis).

    Empty when the document has fewer than ``n`` tokens.
    """
    joined = " || ' ' || ".join(f"element_at({toks_col}, i + {j})" for j in range(n))
    return F.expr(
        f"CASE WHEN size({toks_col}) < {n} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, size({toks_col}) - {n - 1}),"
        f" i -> {joined})) END"
    )


def char_shingles(text_col: str = "text", n: int = 5) -> Column:
    """Distinct character n-gram shingles."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> substring({text_col}, i, {n})))"
    )


def minhash_signature(shingles_col: str = "shingles", num_hashes: int = 64) -> Column:
    """MinHash signature: per seed i, min over shingles of a seeded hash.

    Each shingle string is hashed ONCE (``xxhash64(s)``); the ``num_hashes``
    family members are derived by re-hashing that 8-byte value with the seed
    (``xxhash64(h, i)``). String scans dominate hashing cost, so this is
    ~num_hashes× cheaper than hashing the string per seed while remaining an
    equally valid independent-permutation family.

    array<bigint> of length ``num_hashes``; empty shingle sets get MAX_LONG
    sentinels (they collide only with other empty sets).
    """
    # The base-hash array is bound once via a 1-element transform (SQL has
    # no `let`; without this the string hashes re-evaluate for every seed).
    return F.expr(
        f"transform(array(transform({shingles_col}, s -> xxhash64(s))),"
        f" hs -> transform(sequence(0, {num_hashes - 1}),"
        f" i -> coalesce(array_min(transform(hs, h -> xxhash64(h, i))),"
        f" 9223372036854775807L)))[0]"
    )


def lsh_band_keys(sig_col: str = "sig", bands: int = 16) -> Column:
    """Banded LSH bucket keys: hash each contiguous signature slice.

    array<bigint> of length ``bands``; two docs are candidates iff any band
    key matches. Band size r = len(sig)/bands sets the similarity knee at
    roughly (1/bands)^(1/r).
    """
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> xxhash64(cast(b as string),"
        f" aggregate(slice({sig_col}, b * (size({sig_col}) div {bands}) + 1,"
        f" size({sig_col}) div {bands}),"
        f" 0L, (acc, h) -> xxhash64(acc, h))))"
    )


def simhash64(toks_col: str = "toks") -> Column:
    """64-bit SimHash of a token multiset.

    Per bit b: sum over tokens of ±1 by xxhash64(token) bit b; bit set iff
    the sum is positive. Assembled with bitwise OR (no arithmetic overflow —
    Spark runs ANSI mode).
    """
    bitsum = (
        "aggregate({toks}, 0L, (acc, t) -> acc + "
        "CASE WHEN (shiftright(xxhash64(t), {b}) & 1) = 1 THEN 1 ELSE -1 END)"
    )
    bit_terms = " | ".join(
        f"(CASE WHEN {bitsum.format(toks=toks_col, b=b)} > 0 THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(64)
    )
    return F.expr(f"({bit_terms})")


def hamming64(a: str, b: str) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.expr(f"bit_count({a} ^ {b})")
