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
