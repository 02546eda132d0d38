"""Skew-mitigation helpers (SURVEY.md §7.3.9: 'salt skewed problems').

AQE's skew-join splitting handles join-side skew automatically; aggregation
skew on a hot key (one problem_id carrying a CI-scale fan-in) still funnels
that key's rows into one reducer. :func:`salted_agg` runs the classic
two-phase shape for MERGEABLE aggregates:

    phase 1: groupBy(keys + salt)  — the hot key spreads over N reducers
    phase 2: groupBy(keys)         — merge the N partial buffers

Supported aggregate specs (mergeable algebra): count → sum of partial counts,
sum → sum, min → min, max → max, collect_set → flatten+dedup. Averages must be
requested as (sum, count) and divided by the caller — a salted avg of avgs
would be wrong.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PHASE1 = {
    "count": lambda c: F.count(F.lit(1) if c is None else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "collect_set": lambda c: F.collect_set(c),
}
_PHASE2 = {
    "count": lambda name: F.sum(name),
    "sum": lambda name: F.sum(name),
    "min": lambda name: F.min(name),
    "max": lambda name: F.max(name),
    # array_sort: collect_set promises no order, but partial-buffer arrival
    # order would otherwise leak into the result — sorting makes the merged
    # set value-deterministic under any partitioning.
    "collect_set": lambda name: F.array_sort(F.array_distinct(F.flatten(F.collect_list(name)))),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    exprs: dict[str, tuple[str, str | None]],
    salt_buckets: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation over possibly-skewed ``keys``.

    ``exprs`` maps output name → (agg, column); e.g.
    ``{"n": ("count", None), "total": ("sum", "x"), "hi": ("max", "x")}``.
    ``salt_on`` picks the salt source. The default is CONTENT-STABLE: a hash
    of every input column, so a row salts identically no matter how the input
    was partitioned or ordered — results (including merged collect_set
    arrays, which phase 2 sorts) are reproducible across repartitionings.
    Fully duplicate rows share a bucket; if a hot key's rows are largely
    identical, pass a higher-entropy ``salt_on`` column explicitly.
    """
    unknown = {a for a, _ in exprs.values()} - set(_PHASE1)
    if unknown:
        raise ValueError(f"unsupported salted aggregates: {sorted(unknown)}")
    if salt_on is None:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    else:
        col = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt = F.pmod(F.xxhash64(col), F.lit(salt_buckets))

    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_PHASE1[agg](col).alias(name) for name, (agg, col) in exprs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[_PHASE2[agg](name).alias(name) for name, (agg, _) in exprs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the BIG side, replicate the SMALL side.

    A hot join key funnels its rows through one reducer in a plain shuffle
    join; here each big-side row gets a content-stable salt in [0, salt) and
    the small side is exploded ``salt``× (one copy per salt value), so the
    hot key's rows spread across ``salt`` reducers while every big row still
    meets every matching small row exactly once. Classic replicate-fragment
    (fragment-and-replicate) join; AQE's skew splitting is the automatic
    alternative, this is the explicit tool when AQE's thresholds don't
    trigger (e.g. one mega-key inside an otherwise balanced stage).

    Small-side cost is ``salt``× its size — use for genuinely asymmetric
    joins. ``how`` supports the big-side-preserving joins (inner/left): the
    salt never invents or drops matches because every (big row, small row)
    key pair co-locates under exactly one salt value.

    The salt is a hash of the join key plus a big-side-row disambiguator
    derived from all big columns — NOT a random number, so results are
    reproducible across retries and repartitionings.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    # Collision-safe helper column: an input that already carries `_salt`
    # must keep it (overwriting would change salt semantics AND drop the
    # user's column from the output schema).
    taken = set(big.columns) | set(small.columns)
    sc = "_salt"
    while sc in taken:
        sc += "_"
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    b = big.withColumn(sc, salt_col)
    s = small.withColumn(
        sc, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [*on, sc], how).drop(sc)


def skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/aggregate-key skew diagnostics: the numbers that decide whether a
    key needs :func:`salted_agg` / :func:`salted_join` before the job runs.

    Returns the ``top_k`` hottest keys with, per key: row count, share of all
    rows, and the ratio to a perfectly uniform key (count x distinct_keys /
    total — 1.0 means no skew; the reference planning rule of thumb is to
    salt keys with ratio over ~5-10x). One hash aggregate over the key (map-
    side combine absorbs the hot keys being measured — the profile itself
    cannot skew), one single-row global aggregate joined back as a broadcast
    literal, one top-k. Runs on a column sample's full data, never a
    driver collect.

    Output: (key, n_rows, share, uniform_ratio, rank) — key cast to string
    so profiles of any key type union cleanly into one diagnostics table.
    """
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    topk = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .withColumn(
            "uniform_ratio",
            F.round(F.col("n_rows") * F.col("_nkeys") / F.col("_total"), 6),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("key", "n_rows", "share", "uniform_ratio", "rank")
        .orderBy("rank")
    )


def recommend_plan(
    df: DataFrame, key_col: str | list[str], ratio_threshold: float = 5.0
) -> dict:
    """Turn :func:`skew_profile`'s diagnostics into the salting decision its
    docstring describes: profile the key, compare the hottest key's
    ``uniform_ratio`` against the documented 5-10x rule of thumb, and return
    the advisory ``{"strategy": "salted"|"plain", "hot_key", "hot_ratio",
    "threshold"}``. Composite keys are profiled as their concatenation.
    The scalar decision is one bounded driver read (a single profiled row),
    the same pattern as every planner that inspects stats before picking a
    physical strategy.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    probe = df.select(
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys]).alias("_k")
    )
    top = skew_profile(probe, "_k", top_k=1).collect()
    ratio = float(top[0]["uniform_ratio"]) if top else 1.0
    return {
        "strategy": "salted" if ratio >= ratio_threshold else "plain",
        "hot_key": top[0]["key"] if top else None,
        "hot_ratio": ratio,
        "threshold": float(ratio_threshold),
    }


def auto_agg(
    df: DataFrame,
    keys: list[str],
    exprs: dict[str, tuple[str, str | None]],
    salt_buckets: int = 16,
    ratio_threshold: float = 5.0,
) -> DataFrame:
    """Stats-driven aggregate: :func:`recommend_plan` picks the physical
    strategy, then the aggregate runs either as the plain one-phase groupBy
    (uniform keys — two phases would only add an exchange) or as
    :func:`salted_agg` (hot keys spread over ``salt_buckets`` reducers).
    Both paths produce identical values for the mergeable algebra —
    collect_set is sorted on the plain path too, so the choice is invisible
    to the result (tests pin a skewed fixture flipping the choice while
    hash-matching the oracle).
    """
    rec = recommend_plan(df, keys, ratio_threshold)
    if rec["strategy"] == "salted":
        out = salted_agg(df, keys, exprs, salt_buckets=salt_buckets)
    else:
        unknown = {a for a, _ in exprs.values()} - set(_PHASE1)
        if unknown:
            raise ValueError(f"unsupported aggregates: {sorted(unknown)}")
        aggs = []
        for name, (agg, col) in exprs.items():
            e = _PHASE1[agg](col)
            if agg == "collect_set":
                e = F.array_sort(e)
            aggs.append(e.alias(name))
        out = df.groupBy(*keys).agg(*aggs)
    out._chosen_strategy = rec  # noqa: SLF001 — advisory surfaced for callers/tests
    return out
