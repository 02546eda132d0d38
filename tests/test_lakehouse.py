"""Lakehouse DDL / append / evolution / analyzer facade + plan assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.lakehouse import ObservationAnalyzer, ObservationLakehouse
from observation_lakehouse_spark.plans.inspect import (
    assert_broadcast_join,
    explain_str,
)


@pytest.fixture(scope="module")
def lakehouse(spark, observations, code_implementations, tests_table):
    lh = ObservationLakehouse(spark, database="olake_test")
    lh.create_all()
    lh.append_observations(observations)
    lh.append_code_implementations(code_implementations)
    lh.append_tests(tests_table)
    return lh


def test_tables_roundtrip(lakehouse, observations):
    assert lakehouse.load_observations_table().count() == observations.count()
    assert lakehouse.table("code_implementations").count() == 40
    assert lakehouse.table("tests").count() == 32


def test_partition_pruning_on_managed_table(lakehouse):
    scoped = lakehouse.load_observations_table().filter(
        (F.col("data_set_id") == "DSA") & (F.col("problem_id") == "p_000")
    )
    plan = explain_str(scoped)
    # partition filters must appear as PartitionFilters on the scan, not as
    # post-scan Filter conditions
    assert "PartitionFilters" in plan
    assert scoped.count() == 400


def test_append_is_additive(lakehouse, observations):
    before = lakehouse.load_observations_table().count()
    lakehouse.append_observations(observations.limit(10))
    assert lakehouse.load_observations_table().count() == before + 10


def test_append_casts_to_table_schema(spark, observations):
    """S7 schema-cast on write: a reordered input with narrower types (int
    where the table holds long/double) must land with the TABLE's types.
    Own database: the shared module fixture's counts are asserted elsewhere."""
    lh = ObservationLakehouse(spark, database="olake_cast_test")
    lh.create_observations_table()
    target_fields = lh.load_observations_table().schema.fields
    one = observations.limit(1)
    widened = one.select(
        # reversed column order + every numeric column narrowed where possible
        *[
            one[f.name].cast("int").alias(f.name)
            if f.dataType.simpleString() in ("bigint", "double")
            else one[f.name]
            for f in reversed(target_fields)
        ]
    )
    lh.append_observations(widened)
    after = lh.load_observations_table()
    assert after.count() == 1
    got = {f.name: f.dataType.simpleString() for f in after.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in target_fields}
    assert got == want


def test_schema_evolution(lakehouse):
    lakehouse.evolve_observations_schema("extra_metric", "double")
    cols = lakehouse.load_observations_table().columns
    assert "extra_metric" in cols
    assert lakehouse.load_observations_table().filter(
        F.col("extra_metric").isNotNull()
    ).count() == 0


def test_analyzer_facade(lakehouse):
    analyzer = ObservationAnalyzer(lakehouse)
    df = analyzer.query_observations(
        "SELECT problem_id, COUNT(*) AS n FROM observations "
        "WHERE data_set_id = 'DSA' GROUP BY problem_id ORDER BY problem_id"
    )
    rows = df.collect()
    assert len(rows) == 4 and rows[0]["n"] >= 400
    joined = analyzer.query(
        "SELECT COUNT(*) AS n FROM observations o "
        "JOIN code_implementations c USING (data_set_id, problem_id, implementation_id)"
    )
    assert joined.collect()[0]["n"] == 1600 + 10  # incl. the extra appended rows


def test_three_way_join_broadcasts_dims(observations, code_implementations, tests_table):
    from observation_lakehouse_spark.operators import three_way_join

    joined = three_way_join(observations, code_implementations, tests_table)
    assert_broadcast_join(joined, count=2)


def test_snapshot_table_surface(spark, tmp_path):
    """Lakehouse facade exposes the snapshot-management handle for atomic
    tables and rejects it for catalog formats."""
    import pytest as _pytest

    from observation_lakehouse_spark.lakehouse import ObservationLakehouse
    from tests.conftest import FIXED_TS, observation_rows

    lh = ObservationLakehouse(
        spark, database="olake_snap", table_format="atomic", location=str(tmp_path)
    )
    lh.create_observations_table()
    from observation_lakehouse_spark.schemas import OBSERVATIONS_SCHEMA

    df = spark.createDataFrame(observation_rows(), OBSERVATIONS_SCHEMA)
    lh.append_observations(df)
    lh.append_observations(df.limit(5))
    t = lh.snapshot_table("observations")
    assert [e["version"] for e in t.history()] == [1, 2]
    assert lh.table_at("observations", 1).count() == df.count()
    assert lh.table("observations").count() == df.count() + 5
    t.rollback(1)
    assert lh.table("observations").count() == df.count()

    lh_parquet = ObservationLakehouse(spark, database="olake_snap_pq")
    with _pytest.raises(ValueError, match="atomic"):
        lh_parquet.snapshot_table("observations")
