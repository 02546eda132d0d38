"""Budget-constrained corpus selection — "fill a token budget with the best
documents".

The canonical training-data operation the reference stops short of — it has
no corpus-selection queries at all; the closest surface is its per-table
aggregate accounting (/root/reference/olake/lakehouse.py:365–401, plain SQL
pass-throughs with no global-budget notion). Given a per-document
quality score and token count, keep the highest-quality documents whose
cumulative token mass fits a budget B — the "data selection under a compute
budget" step every LLM pretraining pipeline runs (the selection rule in
DoReMi/DsDm-style pipelines once per-doc scores exist).

The naive formulation is a GLOBAL cumulative sum over the corpus ordered by
quality — a single-partition window over every row, the exact shape that
dies first at 100 TB.  This implementation is the standard two-phase
threshold refinement instead (the same trick as distributed top-k-by-weight
/ TeraSort range partitioning):

1. **Histogram phase** — one map-side-combined aggregate collapses the
   corpus to ``n_bins + 1`` rows of per-quality-bin token mass.  A
   cumulative over THAT (a window over ≤ 1001 rows — bounded by the bin
   count, never the corpus) finds the boundary bin ``b*``: every bin above
   it fits entirely, and the leftover budget inside ``b*`` is known.
2. **Refinement phase** — bins above ``b*`` are kept by a scan-level
   filter (zero shuffle beyond the histogram's);  ONLY the boundary bin
   pays a within-bin running total, and that window is partitioned BY BIN
   — its task sees one bin's occupancy (~corpus/n_bins rows), not the
   corpus, and all bins compute in parallel.

Because bins are a monotone coarsening of the quality key and the within-bin
order extends the global order, the kept set is IDENTICAL to the naive
global-window rule — the DuckDB oracle runs the naive form and must agree
row-for-row.

Integer discipline: quality is taken in exact micro-units (bigint), token
counts are bigint, the budget is derived with integer division — no float
enters any sum, so the boundary decision can never drift between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_sample", "token_budget_select"]


def token_budget_select(
    df: DataFrame,
    id_col: str = "doc_id",
    quality_micro_col: str = "quality_micro",
    tokens_col: str = "n_tokens",
    budget_num: int = 3,
    budget_den: int = 5,
    n_bins: int = 1000,
    quality_micro_max: int = 10_000_000,
) -> DataFrame:
    """Keep the quality-maximal prefix of ``df`` whose token sum fits the
    budget ``B = (budget_num * total_tokens) div budget_den``.

    ``df`` must carry an integer quality in micro-units (``quality_micro``,
    range [0, quality_micro_max]) and an integer token count.  Selection
    order is (quality_micro DESC, id ASC); a document is kept iff the
    running token total through it (inclusive) is ≤ B — exactly the naive
    global-cumulative rule, computed without any corpus-wide window.

    Returns (id, quality_micro, n_tokens) ordered by the selection order.
    """
    span = quality_micro_max // n_bins
    q = F.col(quality_micro_col)
    feats = df.select(
        F.col(id_col),
        q.alias("quality_micro"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.expr(f"CAST({quality_micro_col} AS BIGINT) div {int(span)}").alias("_bin"),
    )
    # Phase 1: per-bin token mass (map-side combined; the exchange carries at
    # most n_bins+1 rows per map partition) + cumulative from the top bin
    # down. The cumulative window is unpartitioned BUT bounded by n_bins —
    # it never sees corpus-sized input.
    mass = feats.groupBy("_bin").agg(F.sum("n_tokens").alias("_mass"))
    w_b = (
        Window.orderBy(F.desc("_bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    binned = mass.select(
        "_bin",
        "_mass",
        F.sum("_mass").over(w_b).alias("_cum"),
        F.sum("_mass").over(w_all).alias("_total"),
    ).withColumn(
        "_budget",
        F.expr(f"CAST({int(budget_num)} * _total AS BIGINT) div {int(budget_den)}"),
    )
    # Boundary bin: the HIGHEST bin whose inclusive cumulative exceeds B.
    # Bins above it fit entirely; bins below it are fully out (their every
    # doc's global running total already exceeds B through the boundary
    # bin's mass). One row — broadcast into the doc-level filter.
    thr = (
        binned.filter(F.col("_cum") > F.col("_budget"))
        .orderBy(F.desc("_bin"))
        .limit(1)
        .select(
            F.col("_bin").alias("_cut_bin"),
            (F.col("_budget") - (F.col("_cum") - F.col("_mass"))).alias("_remaining"),
        )
    )
    # Phase 2: within-bin running totals, partitioned BY BIN — every task is
    # bounded by one bin's occupancy and only the boundary bin's result is
    # consulted. left join on TRUE keeps the "everything fits" case (thr
    # empty → _cut_bin null → keep all).
    w_doc = (
        Window.partitionBy("_bin")
        .orderBy(F.desc("quality_micro"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut: Column = F.col("_cut_bin")
    kept = (
        feats.withColumn("_wcum", F.sum("n_tokens").over(w_doc))
        .join(F.broadcast(thr), F.lit(True), "left")
        .filter(
            cut.isNull()
            | (F.col("_bin") > cut)
            | ((F.col("_bin") == cut) & (F.col("_wcum") <= F.col("_remaining")))
        )
    )
    return kept.select(id_col, "quality_micro", "n_tokens").orderBy(
        F.desc("quality_micro"), F.asc(id_col)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k_per_stratum: int,
    id_cols: list[str] | None = None,
    proportional_base: int | None = None,
) -> DataFrame:
    """Deterministic stratified sampling — ``k`` rows per stratum by
    md5-rank (r12; the data-mixing primitive next to mixture_resample:
    "give me a balanced / proportional slice of every source x language
    cell" without a driver loop or RNG state).

    The "randomness" is the md5 hash of the row's id tuple rendered as
    text — uniform spread, zero state, and BOTH engines replay it exactly
    (the kmeans seeding discipline), so the sample is oracle-checkable
    row-for-row, stable across partitionings, and re-runnable. With
    ``proportional_base`` the per-stratum quota becomes
    ``GREATEST(1, stratum_count * k_per_stratum DIV proportional_base)``
    (integer-exact proportional allocation); without it every stratum
    gets the same flat ``k_per_stratum``.

    Scale shape: ONE hash-partitioned rank window per stratum (no global
    sort, no single-task stage) + for the proportional variant one
    map-side-combinable count aggregate broadcast back; the filter is a
    per-row comparison. Skewed strata parallelize across the window's
    hash partitions exactly like any per-key top-k.
    """
    if k_per_stratum < 1:
        raise ValueError(f"k_per_stratum must be >= 1, got {k_per_stratum}")
    ids = id_cols or [c for c in df.columns if c not in strata_cols]
    if not ids:
        raise ValueError("need at least one id column outside the strata")
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in ids]))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), *[F.col(c).asc() for c in ids])
    ranked = df.withColumn("_rk", F.row_number().over(w))
    if proportional_base is None:
        return ranked.filter(F.col("_rk") <= k_per_stratum).drop("_rk")
    if proportional_base < 1:
        raise ValueError(
            f"proportional_base must be >= 1, got {proportional_base}"
        )
    quota = df.groupBy(*strata_cols).agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"COUNT(1) * {int(k_per_stratum)} DIV {int(proportional_base)}"),
        ).alias("_q")
    )
    return (
        ranked.join(F.broadcast(quota), strata_cols)
        .filter(F.col("_rk") <= F.col("_q"))
        .drop("_rk", "_q")
    )
