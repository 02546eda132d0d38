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
    """Whitespace tokens, empty strings removed.

    ``array_remove`` instead of a ``filter`` lambda: the HOF runs
    interpreted per element, array_remove stays in codegen — same result
    (after ``trim``, a \\s+ split only yields an empty element for the
    empty string itself).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(F.trim(c), _WS), "")


def lower_tokens(text: str | Column) -> Column:
    """Lowercased whitespace tokens — ``lower`` applied to the WHOLE string
    before splitting (one codegen string op) rather than ``transform(...,
    lower)`` per token (interpreted per element). Identical content: case
    mapping never produces whitespace, so the split is unaffected."""
    c = F.col(text) if isinstance(text, str) else text
    return tokens(F.lower(c))


def token_pieces(text: str | Column) -> Column:
    """BPE-ish sub-word pieces (regexp extraction — still JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(_BPE_ISH), 0)


def word_shingles(text: str | Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined), lowercase.

    Built as a chain of ``zip_with`` concats over shifted copies of the token
    array (the same shape as :func:`hashed_word_shingles`), NOT as a
    ``transform`` over an index sequence with a per-position ``slice``: a
    lambda that references the token subexpression re-evaluates the full
    tokenization per element (interpreted HOFs do no common-subexpression
    elimination), which is O(len²) per document — measured 11 s vs 0.6 s to
    shingle 5000 sf0.1 docs. The zip_with chain references tokens ~n+1 times
    total; NULL padding from the shorter shifted side poisons (and later
    drops) the incomplete tail windows. ``array_distinct`` because shingle
    SETS drive Jaccard.
    """
    toks = lower_tokens(text)
    if n == 1:  # fast path: no windowing at all
        return F.array_distinct(toks)
    acc = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    windows = F.filter(acc, lambda x: x.isNotNull())
    return F.when(F.size(toks) >= n, F.array_distinct(windows)).otherwise(
        F.when(F.size(toks) > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


def word_shingle_xxhashes(text: str | Column, n: int = 3) -> Column:
    """Distinct ``xxhash64`` values of :func:`word_shingles` — identical hash
    identity (xxhash64 of the space-joined shingle string), but the string is
    hashed the moment its window is assembled, so everything downstream
    (distinct, persist, explode, joins) carries 8-byte longs instead of
    arbitrary-length text. For operators that only ever compare shingles
    (set-similarity joins), this halves the materialization cost of the
    shingle cache and shrinks it ~10× — with bit-for-bit the same comparison
    outcome as hashing :func:`word_shingles` afterwards.
    """
    toks = lower_tokens(text)
    if n == 1:
        return F.array_distinct(F.transform(toks, lambda t: F.xxhash64(t)))
    acc = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # NULL tails must drop BEFORE hashing: xxhash64(NULL) is the seed value
    # (nulls are skipped by the hash), not NULL, so a post-hash null filter
    # would keep phantom tail windows.
    hashes = F.transform(F.filter(acc, lambda x: x.isNotNull()), lambda x: F.xxhash64(x))
    return F.when(F.size(toks) >= n, F.array_distinct(hashes)).otherwise(
        F.when(F.size(toks) > 0, F.array(F.xxhash64(F.array_join(toks, " ")))).otherwise(
            F.array().cast("array<bigint>")
        )
    )


def char_shingles(text: str | Column, n: int = 5) -> Column:
    """Distinct character n-grams of the lowercased text.

    Same zip_with-chain shape as :func:`word_shingles` (a per-index
    ``substring`` lambda would re-lowercase the whole text per window —
    O(len²) per document).
    """
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    length = F.length(c)
    chars = F.split(c, "")
    acc = chars
    for k in range(1, n):
        shifted = F.slice(chars, k + 1, F.greatest(F.size(chars) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, b))
    windows = F.filter(acc, lambda x: x.isNotNull())
    return F.when(length >= n, F.array_distinct(windows)).otherwise(
        F.when(length > 0, F.array(c)).otherwise(F.array().cast("array<string>"))
    )


_MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31-1


def tok_hash60(text: Column) -> Column:
    """Deterministic 60-bit token hash, reproducible in ANSI-ish SQL.

    ``conv(substr(md5(t), 1, 15), 16, 10)`` — the first 15 hex chars of the
    MD5 digest parsed as an integer, so any engine with ``md5()`` and a
    hex-string cast computes the identical value (DuckDB twin:
    ``('0x' || substr(md5(t), 1, 15))::BIGINT``). Replaces ``xxhash64`` as the
    token/shingle hash family precisely so every downstream sketch (MinHash,
    SimHash, rolling fingerprints) is differentially testable against a SQL
    oracle. NULL in → NULL out.
    """
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")


def md5_hi32(text: Column) -> Column:
    """Bits 32..63 of the cross-engine 64-bit token hash (hex chars 1-8)."""
    return F.conv(F.substring(F.md5(text), 1, 8), 16, 10).cast("long")


def md5_lo32(text: Column) -> Column:
    """Bits 0..31 of the cross-engine 64-bit token hash (hex chars 9-16)."""
    return F.conv(F.substring(F.md5(text), 9, 8), 16, 10).cast("long")


def hashed_word_shingles(text: str | Column, n: int = 3) -> Column:
    """Distinct n-token shingle HASHES (array<long>), never materializing the
    shingle strings.

    Each token is hashed once (:func:`tok_hash60`); consecutive-token windows combine via a
    polynomial rolling combine over ``zip_with``-shifted hash arrays — O(n·len)
    long arithmetic instead of per-position array slicing + string joins. This
    is the input MinHash actually needs (it only ever hashes the shingle), so
    the string shingle path (:func:`word_shingles`) is reserved for operators
    that report shingles to humans.

    Edge semantics match :func:`word_shingles`: docs with 0 < tokens < n get a
    single whole-doc shingle; empty docs get an empty array.
    """
    toks = lower_tokens(text)
    p = F.lit(_MINHASH_PRIME).cast("long")
    mult = F.lit(1000003).cast("long")
    hh = F.transform(toks, lambda t: F.pmod(tok_hash60(t), p))
    acc = hh
    for k in range(1, n):
        # Align h[i+k] under h[i]; zip_with pads the shorter side with NULL,
        # which poisons (and later drops) the incomplete tail windows.
        shifted = F.slice(hh, k + 1, F.greatest(F.size(hh) - k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.pmod(a * mult + b, p))
    windows = F.filter(acc, lambda x: x.isNotNull())
    whole_doc = F.array(
        F.aggregate(hh, F.lit(0).cast("long"), lambda a, b: F.pmod(a * mult + b, p))
    )
    return F.when(F.size(toks) >= n, F.array_distinct(windows)).otherwise(
        F.when(F.size(toks) > 0, whole_doc).otherwise(F.array().cast("array<long>"))
    )


def hashed_shingles(shingles: Column) -> Column:
    """Shingle strings → int64 hashes in [0, 2^31-1): hash each shingle ONCE.

    The expensive string hash happens here, a single pass; the MinHash hash
    family is then cheap multiply-add permutations over these longs. Callers
    should materialize this column (persist / write) before fanning out the
    signature slots, otherwise projection collapse re-inlines the string hash.
    """
    p = F.lit(_MINHASH_PRIME).cast("long")
    return F.transform(shingles, lambda s: F.pmod(tok_hash60(s), p))


def minhash_signature(
    shingle_hashes: Column, num_hashes: int = 128, seed: int = 42
) -> Column:
    """MinHash signature from pre-hashed shingles (:func:`hashed_shingles`).

    Slot i = min over shingles of ``(a_i * h + b_i) mod p`` — the standard
    universal-hash permutation family, seeded deterministically. All long
    arithmetic: a,b,h < 2^31 so a*h < 2^62 never overflows ANSI bigint.
    Empty shingle arrays yield NULL mins; filter empty docs upstream.
    """
    import random

    rnd = random.Random(seed)
    p = F.lit(_MINHASH_PRIME).cast("long")
    coeffs = [
        (rnd.randrange(1, _MINHASH_PRIME), rnd.randrange(0, _MINHASH_PRIME))
        for _ in range(num_hashes)
    ]
    def perm(a: int, b: int):
        # Closure factory: PySpark infers HOF arity from the lambda signature,
        # so the coefficients must not appear as (default) parameters.
        return lambda h: F.pmod(h * F.lit(a).cast("long") + F.lit(b).cast("long"), p)

    return F.array(
        *[F.array_min(F.transform(shingle_hashes, perm(a, b))) for a, b in coeffs]
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

    Per token: 64-bit md5-prefix hash → ±1 per bit; accumulate a 64-wide vector with
    ``aggregate``+``zip_with``; sign → bit. Returns BIGINT fingerprint.

    Shift amounts must be Python ints for the ``shiftright`` builtin, so the
    64-bit unrolling happens at plan-construction time (a 64-element literal
    array expression), not via a ``sequence`` lambda.
    """

    def bit_signs(t: Column) -> Column:
        # Same cross-engine md5 family as the explode-based operator
        # (operators.dedup.simhash_fingerprints): bits 0..31 from the low
        # word, 32..63 from the high word of the 64-bit digest prefix.
        hi, lo = md5_hi32(t), md5_lo32(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(lo if i < 32 else hi, i % 32).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
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

    ``fp = (fp * 1000003 + tok_hash60(tok) mod M) mod M`` — a Rabin-Karp-style
    document fingerprint: equal iff token sequences equal (mod collisions).
    pmod keeps the accumulator < 2^31 so the multiply never overflows ANSI longs.
    """
    m = F.lit(modulus).cast("long")
    return F.aggregate(
        token_array,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(1000003).cast("long") + F.pmod(tok_hash60(t), m), m),
    )
