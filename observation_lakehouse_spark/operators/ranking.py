"""Pairwise-comparison ratings: Bradley–Terry via the MM algorithm.

Domain extension (the reference ingests chatbot-arena-style exports —
/root/reference/olake/ingest/arena.py maps battle records; SURVEY.md §2.1
S4): ranking implementations/models FROM pairwise outcomes is the canonical
analytics over that data. Elo is sequential (order-dependent, inherently
serial); Bradley–Terry (1952) is the batch formulation — the probability a
beats b is ``w_a / (w_a + w_b)`` — and its maximum-likelihood weights come
from Hunter's MM iteration (Ann. Stat. 2004):

    w_i' = W_i / Σ_{j≠i} t_ij / (w_i + w_j)

with ``W_i`` = i's total (smoothed) wins and ``t_ij`` = total battles
between i and j. Every round is one self-join of the item-bounded weight
table against the pair-count table plus a hash aggregate.

Scale design
------------
- ONE corpus-sized stage: the battle log aggregates to ordered-pair win
  counts (hash aggregate, map-side combinable). Everything after is bounded
  by the ITEM PAIR table (items², items ≤ thousands) — the unigram/BPE loop
  shape.
- Exact integer fixed-point: weights live in micro-units; each MM round's
  divisions are integer ``div`` of DECIMAL products (both engines truncate
  toward zero — the r7 rule; products go through DECIMAL(38,0)/HUGEINT so
  no operand overflows int64, and every quotient is small by construction,
  the r8 ANSI rule). Sums are integer — order-independent across any
  partitioning, so an unrolled-CTE SQL oracle replays the whole iteration
  bit-for-bit.
- Add-one smoothing on both directions of every OBSERVED pair keeps every
  item's win total positive (no zero-weight sink) and regularizes exactly
  like the chi2/PSI family's smoothed counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bradley_terry", "bradley_terry_from_pairs", "pairwise_win_matrix"]

# fixed-point scales: weights in micro (1e6); the per-term quotient carries
# an extra 1e9 so one truncation per term costs < 1e-9 of the true value
_S = 1_000_000_000
_MICRO = 1_000_000
_MS = _MICRO * _S  # one combined literal: a 3-factor DECIMAL product errors in DuckDB (r9)


def bradley_terry(
    battles: DataFrame,
    winner_col: str = "winner_id",
    loser_col: str = "loser_id",
    n_rounds: int = 4,
) -> DataFrame:
    """MM-iterated Bradley–Terry ratings from a (winner, loser) battle log.

    Returns (item, rating_micro, wins, battles) — ``rating_micro`` the
    integer micro-unit MM weight after ``n_rounds``, normalized each round
    so ratings sum to ``n_items · 1e6`` (the scale-invariance gauge);
    ``wins``/``battles`` are the raw (unsmoothed) totals. Ordered by
    rating DESC, item ASC. NULL item ids are excluded; self-battles are
    ignored.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    w, l = winner_col, loser_col
    raw = (
        battles.filter(
            F.col(w).isNotNull() & F.col(l).isNotNull() & (F.col(w) != F.col(l))
        )
        .groupBy(F.col(w).alias("a"), F.col(l).alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    # ONE corpus pass: the ordered-pair win counts are the only stage that
    # sees the battle log; checkpointed because three frames consume them
    raw = raw.localCheckpoint(eager=True)
    return bradley_terry_from_pairs(raw, n_rounds=n_rounds)


def bradley_terry_from_pairs(raw: DataFrame, n_rounds: int = 4) -> DataFrame:
    """:func:`bradley_terry`'s math over PRE-AGGREGATED ordered-pair win
    counts ``(a, b, n_ab)`` — the seam the streaming ratings monitor
    shares, so the live report is bit-identical to the batch operator over
    the same delivered counts by construction (the chi2_from_counts
    pattern). ``raw`` should be materialized (checkpoint/table read): the
    smoothing union and the post-loop totals consume it three times."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    # both orientations of every observed unordered pair, add-one smoothed;
    # t_ab = total battles of the pair (symmetric), n_ab = a's smoothed wins
    pairs = (
        raw.select("a", "b", "n_ab")
        .unionByName(
            raw.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.lit(0).alias("n_ab")
            )
        )
        .groupBy("a", "b")
        .agg((F.sum("n_ab") + F.lit(1)).alias("n_ab"))
    )
    t = pairs.alias("p").join(
        pairs.select(
            F.col("a").alias("b"), F.col("b").alias("a"), F.col("n_ab").alias("n_ba")
        ).alias("q"),
        ["a", "b"],
    ).select("a", "b", "n_ab", (F.col("n_ab") + F.col("n_ba")).alias("t_ab"))
    # Loop scoping (the r9 width discipline): everything below is bounded by
    # the item-pair table — measure it, size the loop's exchanges to it, and
    # checkpoint the loop inputs AT that width (co-partition-at-MAX rule).
    spark = raw.sparkSession
    t = t.localCheckpoint(eager=True)
    n_pairs = t.count()
    parallelism = spark.sparkContext.defaultParallelism
    loop_parts = max(1, min(parallelism, -(-n_pairs // 100_000)))
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        return _bt_loop(t, loop_parts, n_rounds, raw)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)


def _bt_loop(t: DataFrame, loop_parts: int, n_rounds: int, raw: DataFrame) -> DataFrame:
    t = t.repartition(loop_parts, "a").localCheckpoint(eager=True)
    wins = (
        t.groupBy("a").agg(F.sum("n_ab").alias("W"))
        .repartition(loop_parts, "a")
        .localCheckpoint(eager=True)
    )
    n_items = wins.count()
    cur = wins.select("a", F.lit(_MICRO).cast("long").alias("wm"))
    for _ in range(n_rounds):
        d = (
            t.join(cur.withColumnRenamed("a", "_i").withColumnRenamed("wm", "w_i"),
                   F.col("a") == F.col("_i"))
            .join(cur.withColumnRenamed("a", "_j").withColumnRenamed("wm", "w_j"),
                  F.col("b") == F.col("_j"))
            .select(
                "a",
                F.expr(
                    f"CAST(CAST(t_ab AS DECIMAL(38,0)) * {_MS} "
                    f"DIV (w_i + w_j) AS BIGINT)"
                ).alias("term"),
            )
            .groupBy("a")
            .agg(F.sum("term").alias("d"))
        )
        upd = wins.join(d, "a").select(
            "a",
            F.expr(
                f"CAST(CAST(W AS DECIMAL(38,0)) * {_MS} DIV d AS BIGINT)"
            ).alias("wm_raw"),
        )
        total = upd.agg(F.sum("wm_raw").alias("sw"))
        cur = (
            upd.crossJoin(F.broadcast(total))
            .select(
                "a",
                F.expr(
                    f"CAST(CAST(wm_raw AS DECIMAL(38,0)) * {n_items * _MICRO} "
                    f"DIV sw AS BIGINT)"
                ).alias("wm"),
            )
            .localCheckpoint(eager=True)
        )
    raw_wins = raw.groupBy("a").agg(F.sum("n_ab").alias("wins"))
    raw_tot = (
        raw.select("a", "n_ab")
        .unionByName(raw.select(F.col("b").alias("a"), "n_ab"))
        .groupBy("a")
        .agg(F.sum("n_ab").alias("battles"))
    )
    return (
        cur.join(raw_tot, "a")
        .join(raw_wins, "a", "left")
        .select(
            F.col("a").alias("item"),
            F.col("wm").alias("rating_micro"),
            F.coalesce("wins", F.lit(0)).alias("wins"),
            "battles",
        )
        .orderBy(F.desc("rating_micro"), F.asc("item"))
    )


def pairwise_win_matrix(
    battles: DataFrame,
    winner_col: str = "winner_id",
    loser_col: str = "loser_id",
) -> DataFrame:
    """The arena win-rate matrix with uncertainty: per unordered item pair
    (a < b by string order), win counts both ways, the exact integer win
    rate, and the Wilson score lower bound (z = 1.96) — the display layer
    next to :func:`bradley_terry` (which pair is actually decided vs still
    noise).

    One corpus-sized hash aggregate, then pure per-row column algebra.
    Determinism: counts are exact integers; ``win_rate_ppm`` is an integer
    ``div``; the Wilson bound is ONE double expression over those exact
    integers, rounded once to ppm — identical IEEE inputs → identical
    doubles → identical rounding in both engines (the roc_auc discipline).
    Output: (item_a, item_b, wins_ab, wins_ba, battles, win_rate_ppm,
    wilson_low_ppm) ordered by (item_a, item_b).
    """
    w, l = winner_col, loser_col
    raw = (
        battles.filter(
            F.col(w).isNotNull() & F.col(l).isNotNull() & (F.col(w) != F.col(l))
        )
        .select(
            F.least(F.col(w).cast("string"), F.col(l).cast("string")).alias("item_a"),
            F.greatest(F.col(w).cast("string"), F.col(l).cast("string")).alias(
                "item_b"
            ),
            F.when(
                F.col(w).cast("string") <= F.col(l).cast("string"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("_a_won"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("_a_won").alias("wins_ab"),
            (F.count(F.lit(1)) - F.sum("_a_won")).alias("wins_ba"),
            F.count(F.lit(1)).alias("battles"),
        )
    )
    # Wilson lower bound at z=1.96: (p + z²/2n − z·√(p(1−p)/n + z²/4n²))/(1+z²/n)
    p = F.col("wins_ab").cast("double") / F.col("battles").cast("double")
    n = F.col("battles").cast("double")
    z2 = F.lit(3.8416)
    z = F.lit(1.96)
    wilson = (
        p + z2 / (2 * n) - z * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (4 * n * n))
    ) / (F.lit(1.0) + z2 / n)
    return raw.select(
        "item_a",
        "item_b",
        "wins_ab",
        "wins_ba",
        "battles",
        F.expr(f"wins_ab * {_MICRO} div battles").alias("win_rate_ppm"),
        F.round(wilson * F.lit(1_000_000.0)).cast("long").alias("wilson_low_ppm"),
    ).orderBy("item_a", "item_b")
