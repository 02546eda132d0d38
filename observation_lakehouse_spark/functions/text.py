"""Text column expressions shared by the dedup / text-analysis operators.

All JVM-side (built-in functions only — no UDFs): tokenization, shingling,
hashing. These are the building blocks the 100 TB pipelines compose, so staying
inside whole-stage codegen here matters more than anywhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer; a BPE-ish sub-word regex lives in token_pieces().
_WS = r"\s+"
# Rough byte-pair-style pieces: runs of letters, digits, or single punctuation —
# the shape GPT-style tokenizers produce, without a vocab. Public regex idiom.
_BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: str | Column) -> Column:
    """Whitespace tokens, empty strings removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), _WS), lambda t: t != "")


def token_pieces(text: str | Column) -> Column:
    """BPE-ish sub-word pieces (regexp extraction — still JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(_BPE_ISH), 0)


def word_shingles(text: str | Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined), lowercase.

    ``transform`` over an index ``sequence`` builds the sliding window without
    leaving codegen; ``array_distinct`` because shingle SETS drive Jaccard.
    """
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle = lambda i: F.array_join(F.slice(toks, i + 1, n), " ")  # noqa: E731
    return F.when(F.size(toks) >= n, F.array_distinct(F.transform(idx, shingle))).otherwise(
        F.when(F.size(toks) > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


def char_shingles(text: str | Column, n: int = 5) -> Column:
    """Distinct character n-grams of the lowercased text."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    length = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(length - n + 1, F.lit(1)))
    return F.when(
        length >= n, F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))
    ).otherwise(F.when(length > 0, F.array(c)).otherwise(F.array().cast("array<string>")))


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of salted xxhash64.

    Salting ``xxhash64(lit(i), s)`` gives an independent hash family per slot —
    one pass over the shingle array per slot, all inside codegen. Empty shingle
    sets get NULL mins; callers should filter empty docs first.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(i, s))),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Split a MinHash signature into banded bucket keys: array<struct<band,key>>.

    Two docs collide in a band iff their signatures agree on ALL rows of that
    band → P(collide) = 1-(1-j^r)^b, the standard LSH S-curve.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.to_json(F.slice(signature, b * rows_per_band + 1, rows_per_band)))
            .alias("key"),
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two shingle arrays (treated as sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


def simhash64(token_array: Column) -> Column:
    """64-bit SimHash of a token array, fully declarative.

    Per token: xxhash64 → ±1 per bit; accumulate a 64-wide vector with
    ``aggregate``+``zip_with``; sign → bit. Returns BIGINT fingerprint.

    Shift amounts must be Python ints for the ``shiftright`` builtin, so the
    64-bit unrolling happens at plan-construction time (a 64-element literal
    array expression), not via a ``sequence`` lambda.
    """

    def bit_signs(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1).cast("long")
                ).otherwise(F.lit(-1).cast("long"))
                for i in range(64)
            ]
        )

    bit_votes = F.aggregate(
        token_array,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(acc, bit_signs(t), lambda a, b: a + b),
    )
    # Fold sign bits into one BIGINT. Bit 63's power is long MIN_VALUE (two's
    # complement); disjoint bits → XOR == OR, no overflow anywhere.
    powers = F.array(
        *[
            F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
            for i in range(64)
        ]
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def rolling_fingerprint(token_array: Column, modulus: int = 1 << 31) -> Column:
    """Order-sensitive polynomial rolling hash of a token sequence (BIGINT).

    ``fp = (fp * 1000003 + xxhash64(tok) mod M) mod M`` — a Rabin-Karp-style
    document fingerprint: equal iff token sequences equal (mod collisions).
    pmod keeps the accumulator < 2^31 so the multiply never overflows ANSI longs.
    """
    m = F.lit(modulus).cast("long")
    return F.aggregate(
        token_array,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(1000003).cast("long") + F.pmod(F.xxhash64(t), m), m),
    )
