"""Three-way observation ⋈ code ⋈ tests join (SURVEY.md §2.3 J1/J2).

Semantics match the reference query (/root/reference/benchmark_three_way_join.py:53-74):
inner equi-joins on composite keys

    observations ⋈ code_implementations ON (implementation_id, data_set_id, problem_id)
                 ⋈ tests               ON (test_id,          data_set_id, problem_id)

projecting all observation columns plus ``program_code`` (impl source),
``test_code`` (test source) and ``language``.

Physical strategy for 100 TB: observations is the fact table (one row per
execution step); code_implementations and tests are dimensions, smaller by the
step-count × test-count factor. Both dimension sides are broadcast — no shuffle
of the fact table at all; with a partition filter the scan reads one partition
and the join is a map-side hash join. When a dimension is too big to broadcast
(CI-scale), drop the hint and AQE picks SMJ with dynamic partition pruning from
the dimension filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def three_way_join(
    observations: DataFrame,
    code_implementations: DataFrame,
    tests: DataFrame,
    data_set_id: str | None = None,
    problem_id: str | None = None,
    broadcast_dims: bool = True,
) -> DataFrame:
    """observations ⋈ code ⋈ tests with per-leg partition filters (J2).

    The reference repeats the (data_set_id, problem_id) literal on all three legs
    so each engine prunes each scan independently — we do the same rather than
    relying on Catalyst's filter inference, so pruning is static on every leg.
    """

    def scoped(df: DataFrame) -> DataFrame:
        if data_set_id is not None:
            df = df.filter(F.col("data_set_id") == data_set_id)
        if problem_id is not None:
            df = df.filter(F.col("problem_id") == problem_id)
        return df

    obs = scoped(observations)
    code = scoped(code_implementations).select(
        "data_set_id",
        "problem_id",
        "implementation_id",
        F.col("source_code").alias("program_code"),
        "language",
    )
    tst = scoped(tests).select(
        "data_set_id",
        "problem_id",
        "test_id",
        F.col("source_code").alias("test_code"),
    )
    if broadcast_dims:
        code = F.broadcast(code)
        tst = F.broadcast(tst)

    return obs.join(
        code, on=["implementation_id", "data_set_id", "problem_id"], how="inner"
    ).join(tst, on=["test_id", "data_set_id", "problem_id"], how="inner")
