"""Dataset statistics (SURVEY.md §2.4 A5/A6/A12, §2.6 O2/O3).

Semantics match the reference's stats scripts (/root/reference/stats.py:14-34,
/root/reference/per_problem_stats.py:13-35): a per-problem aggregation
(COUNT(*), two COUNT(DISTINCT)s, oracle rows excluded) feeding a global rollup
with derived averages.

Scale note (SURVEY.md §7.3.9): two exact COUNT(DISTINCT)s in one aggregate expand
to ``expand``+double shuffle in Spark; at 100 TB use ``approximate=True`` which
swaps in HyperLogLog++ sketches (``approx_count_distinct``, single pass, mergeable
partial aggregation) at a default 5% relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_problem_stats(observations: DataFrame, approximate: bool = False) -> DataFrame:
    """Per (data_set_id, problem_id): impl/test cardinalities + observation count."""
    cd = F.approx_count_distinct if approximate else F.countDistinct
    return (
        observations.filter(~F.col("specified_oracle"))
        .groupBy("data_set_id", "problem_id")
        .agg(
            cd("implementation_id").alias("num_implementations"),
            cd("test_id").alias("num_tests"),
            F.count(F.lit(1)).alias("total_observations"),
        )
        .withColumn(
            "avg_calls", F.col("total_observations") / F.col("num_tests")
        )
        .orderBy(F.desc("total_observations"))
    )


def dataset_stats(observations: DataFrame, approximate: bool = False) -> DataFrame:
    """Global rollup of :func:`per_problem_stats` with derived averages."""
    per_problem = per_problem_stats(observations, approximate=approximate)
    return per_problem.agg(
        F.count("problem_id").alias("num_problems"),
        F.sum("num_implementations").alias("total_implementations"),
        F.sum("num_tests").alias("total_tests"),
        F.sum("total_observations").alias("total_observations"),
        (F.sum("num_implementations") / F.count("problem_id")).alias("avg_impls"),
        (F.sum("num_tests") / F.count("problem_id")).alias("avg_tests"),
        (F.sum("total_observations") / F.sum("num_tests")).alias("avg_calls"),
    )


def problem_enumeration(observations: DataFrame) -> DataFrame:
    """Distinct (data_set_id, problem_id) pairs (A13 — the benchmark drivers'
    problem loop, reference benchmark_srm_output_view.py:30-33)."""
    return observations.select("data_set_id", "problem_id").distinct()


def top_problems(observations: DataFrame, k: int = 10) -> DataFrame:
    """Top-k problems by observation count (O3 — TakeOrderedAndProject, no full sort)."""
    return (
        observations.groupBy("data_set_id", "problem_id")
        .agg(F.count(F.lit(1)).alias("total_observations"))
        .orderBy(F.desc("total_observations"))
        .limit(k)
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations among numeric columns in ONE pass —
    the data-profiling companion to regression_stats: a single aggregate
    computes every Σx, Σx² and Σxᵢxⱼ as EXACT decimal co-moments (cast to
    double once), then the d·(d−1)/2 pair rows unfold driver-free via
    ``stack``. Rows with a NULL in ANY profiled column are excluded up
    front so every pair shares one n (the listwise-deletion convention —
    per-pair n would make the matrix non-PSD).

    Scale: one map-side-combinable aggregate over d + d(d+1)/2 running
    sums; no shuffle carries rows. Degenerate pairs (either side constant)
    return NULL. Output: (var_a, var_b, n, corr) for i < j, ordered.
    """
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError("need at least two columns")
    nn = None
    for c in cols:
        nn = F.col(c).isNotNull() if nn is None else nn & F.col(c).isNotNull()
    d = {c: F.col(c).cast("decimal(18,2)") for c in cols}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(d[c]).cast("double").alias(f"_s_{c}"))
        aggs.append(F.sum(d[c] * d[c]).cast("double").alias(f"_q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(d[a] * d[b]).cast("double").alias(f"_x_{a}_{b}"))
    one = df.filter(nn).agg(*aggs)
    branches = ", ".join(
        f"'{a}', '{b}', `_x_{a}_{b}`, `_s_{a}`, `_s_{b}`, `_q_{a}`, `_q_{b}`"
        for a, b in pairs
    )
    long = one.selectExpr(
        "_n",
        f"stack({len(pairs)}, {branches}) AS (var_a, var_b, sxy, sx, sy, sx2, sy2)",
    )
    n = F.col("_n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sx2") - F.col("sx") * F.col("sx") / n
    vy = F.col("sy2") - F.col("sy") * F.col("sy") / n
    corr = F.when(
        (F.col("_n") >= 2) & (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
    )
    return long.select(
        "var_a", "var_b", F.col("_n").alias("n"), corr.alias("corr")
    ).orderBy("var_a", "var_b")
