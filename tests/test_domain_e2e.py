"""End-to-end tests of the four reference query families on the planted domain
fixtures (SURVEY.md §5 'rebuild test strategy', FIXTURES.md §A invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from observation_lakehouse_spark.operators import (
    behavioral_clustering,
    consensus_oracle,
    srm_output_view,
    three_way_join,
)
from observation_lakehouse_spark.operators.srm import srm_output_map
from observation_lakehouse_spark.operators.stats import (
    dataset_stats,
    per_problem_stats,
    problem_enumeration,
    top_problems,
)
from tests.conftest import N_IMPLS, N_PROBLEMS, N_STEPS, N_TESTS


def test_srm_output_view_shape(observations):
    srm = srm_output_view(observations, problem_id="p_000", data_set_id="DSA")
    rows = srm.collect()
    # rows = tests × steps; columns = (test_id, step_id) + one per implementation
    assert len(rows) == N_TESTS * N_STEPS
    assert len(srm.columns) == 2 + N_IMPLS
    # planted: impls 0-5 and 9 agree except impl 9's exception cell
    first = rows[0].asDict()
    assert first["impl_00_original_0"] == first["impl_05_original_0"]


def test_srm_pivot_and_map_agree(observations):
    pivot = srm_output_view(observations, problem_id="p_001", data_set_id="DSA")
    mapped = srm_output_map(observations, problem_id="p_001", data_set_id="DSA")
    p_rows = {(r["test_id"], r["step_id"]): r.asDict() for r in pivot.collect()}
    m_rows = {(r["test_id"], r["step_id"]): r["outputs"] for r in mapped.collect()}
    assert p_rows.keys() == m_rows.keys()
    for key, mrow in m_rows.items():
        for impl, out in mrow.items():
            assert p_rows[key][impl] == out


def test_behavioral_clustering_planted_sizes(observations):
    clusters = behavioral_clustering(observations, problem_id="p_000", data_set_id="DSA")
    got = clusters.collect()
    assert [r["cluster_size"] for r in got] == [6, 3, 1]
    # Σ cluster_size == #implementations (the 13,384 invariant of the reference)
    assert sum(r["cluster_size"] for r in got) == N_IMPLS
    assert all(r["test_size"] == N_TESTS for r in got)
    # clusters partition the implementation set
    members = [m for r in got for m in r["equivalent_commits_cluster"]]
    assert len(members) == len(set(members)) == N_IMPLS
    # the singleton is the exception-throwing impl 9
    assert got[-1]["equivalent_commits_cluster"] == ["impl_09_original_0"]


def test_clustering_invariant_to_row_order(spark, observations):
    shuffled = observations.orderBy(F.rand(seed=7))
    a = behavioral_clustering(observations, problem_id="p_002", data_set_id="DSA").collect()
    b = behavioral_clustering(shuffled, problem_id="p_002", data_set_id="DSA").collect()
    assert [
        (r["cluster_size"], r["equivalent_commits_cluster"]) for r in a
    ] == [(r["cluster_size"], r["equivalent_commits_cluster"]) for r in b]


def test_consensus_oracle_is_majority(observations):
    top = consensus_oracle(observations, problem_id="p_000", data_set_id="DSA").collect()
    assert len(top) == 1
    assert top[0]["cluster_size"] == 6
    assert "impl_00_original_0" in top[0]["equivalent_commits_cluster"]


def test_three_way_join(observations, code_implementations, tests_table):
    joined = three_way_join(
        observations, code_implementations, tests_table,
        data_set_id="DSA", problem_id="p_000",
    )
    n_obs = N_IMPLS * N_TESTS * N_STEPS
    assert joined.count() == n_obs  # inner joins are key-preserving here
    cols = set(joined.columns)
    assert {"program_code", "test_code", "language"} <= cols
    row = joined.filter(
        (F.col("implementation_id") == "impl_03_original_0")
        & (F.col("test_id") == "t_01()") & (F.col("step_id") == 0)
    ).first()
    assert "class P0_3" in row["program_code"]
    assert row["test_code"].startswith('{"cells"')


def test_pivot_cell_is_unique_output_when_deduplicated(spark, observations):
    """SURVEY §5 property: after (test, step, impl) dedup, each pivot cell IS
    the unique output for that coordinate — FIRST degenerates to identity."""
    deduped = observations.dropDuplicates(["test_id", "step_id", "implementation_id"])
    srm = srm_output_view(deduped, problem_id="p_003", data_set_id="DSA")
    cells = {
        (r["test_id"], r["step_id"], impl): r[impl]
        for r in srm.collect()
        for impl in srm.columns[2:]
    }
    expected = {
        (r["test_id"], r["step_id"], r["implementation_id"]): r["output"]
        for r in deduped.filter(
            (F.col("problem_id") == "p_003") & (F.col("data_set_id") == "DSA")
        ).collect()
    }
    for key, out in expected.items():
        assert cells[key] == out


def test_stats(observations):
    per = per_problem_stats(observations).collect()
    assert len(per) == N_PROBLEMS
    for r in per:
        assert r["num_implementations"] == N_IMPLS
        assert r["num_tests"] == N_TESTS
        assert r["total_observations"] == N_IMPLS * N_TESTS * N_STEPS
        assert r["avg_calls"] == N_IMPLS * N_STEPS
    g = dataset_stats(observations).collect()[0]
    assert g["num_problems"] == N_PROBLEMS
    assert g["total_implementations"] == N_PROBLEMS * N_IMPLS
    assert g["avg_impls"] == float(N_IMPLS)
    assert problem_enumeration(observations).count() == N_PROBLEMS
    assert top_problems(observations, k=2).count() == 2
