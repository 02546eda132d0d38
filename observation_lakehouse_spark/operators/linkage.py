"""Entity resolution: blocked edit-distance matching (record linkage).

The classic dirty-dimension problem — the same real-world entity spelled
slightly differently across sources — resolved as candidate blocking +
exact Levenshtein verification, all in JVM codegen (``F.levenshtein`` is a
built-in; no Python touches row data).

Blocking is LOSSLESS for the edit-distance predicate: two strings within
edit distance k differ in length by at most k, so emitting each left string
under the keys ``len .. len+k`` (a ±k band once pair order fixes direction)
and joining on the right string's exact length covers every qualifying pair
exactly once. That bounds the join to length-cohort cross products instead
of the full N² — the standard length-filter of Ed-Join/PassJoin. For corpora
where single length cohorts are still huge, ``extra_block_col`` adds a
caller-chosen equality block (source, country, phonetic key) on top; that
second block is the usual recall/scale trade and is the caller's call, not a
silent default.

Semantics from the reference's dedup intent (code_hash identity for exact
duplicates, /root/reference/olake/lakehouse.py:99) extended to the
approximate-identity case; implementation is original Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    max_dist: int = 2,
    extra_block_col: str | None = None,
) -> DataFrame:
    """All unordered pairs of DISTINCT ``text_col`` values within Levenshtein
    distance ``max_dist``.

    Output: ``(name_a, name_b, dist)`` with ``name_a < name_b``, one row per
    qualifying pair. Pair direction is fixed by string order, so the left
    side emits block keys ``len(a) - max_dist .. len(a) + max_dist`` and the
    right side its exact length — every qualifying pair meets on exactly one
    key (no post-join distinct needed).

    Plan: distinct (hash aggregate, persisted — it feeds BOTH join sides, and
    projection collapse would otherwise run the corpus distinct twice) → one
    equi-join on (block length [, extra block]) → codegen ``levenshtein``
    verification. The verifier also re-checks the length band, letting
    Catalyst prune impossible combinations early.

    With ``extra_block_col``: matching is scoped WITHIN equal block values —
    a pair must share a block to be compared (rows with a NULL block match
    nothing, the standard blocking-key convention), and a pair co-occurring
    under several block values is still reported once.
    """
    cols = [F.col(text_col).alias("name")] + (
        [F.col(extra_block_col).alias("_xb")] if extra_block_col else []
    )
    names = df.select(*cols).filter(F.col("name").isNotNull()).distinct().persist()
    left = names.select(
        F.col("name").alias("name_a"),
        *([F.col("_xb")] if extra_block_col else []),
        F.explode(
            F.sequence(
                F.length("name") - F.lit(max_dist),
                F.length("name") + F.lit(max_dist),
            )
        ).alias("_blk_len"),
    )
    right = names.select(
        F.col("name").alias("name_b"),
        *([F.col("_xb")] if extra_block_col else []),
        F.length("name").alias("_blk_len"),
    )
    join_cond = (F.col("l._blk_len") == F.col("r._blk_len")) & (
        F.col("l.name_a") < F.col("r.name_b")
    )
    if extra_block_col is not None:
        join_cond = join_cond & (F.col("l._xb") == F.col("r._xb"))
    out = (
        left.alias("l")
        .join(right.alias("r"), join_cond)
        .select(
            F.col("l.name_a").alias("name_a"),
            F.col("r.name_b").alias("name_b"),
            F.levenshtein("l.name_a", "r.name_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
    if extra_block_col is not None:
        # the same name pair can co-occur under several block values (one
        # join match per shared block) — report it once
        out = out.dropDuplicates(["name_a", "name_b"])
    out._cached_deps = (names,)  # noqa: SLF001 — release_cached contract
    return out
