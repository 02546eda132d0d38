"""Table schemas for the observation lakehouse (the §1.2 contract).

Reproduces the reference's three Iceberg schemas field-for-field
(/root/reference/olake/lakehouse.py:49-127) as Spark ``StructType``s:

- ``observations`` — one row per execution step of one test against one
  implementation (20 columns).
- ``code_implementations`` — candidate implementation source + metrics (9 columns).
- ``tests`` — test sequence sheets (8 effective columns; the reference comments out
  two metric fields at lakehouse.py:122-123, so they are omitted here too).

Iceberg ``required=True`` maps to ``nullable=False``; Iceberg ``timestamp`` (µs,
no timezone) maps to ``TimestampNTZType`` (SURVEY.md §7.3.5). All three tables are
identity-partitioned on (data_set_id, problem_id) — the layout that the reference
credits for its sub-100 ms per-problem latency (reference README.md:112) and that
Catalyst turns into static partition pruning.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

PARTITION_COLUMNS = ("data_set_id", "problem_id")

# reference: olake/lakehouse.py:49-88
OBSERVATIONS_SCHEMA = StructType(
    [
        StructField("data_set_id", StringType(), nullable=False),
        StructField("problem_id", StringType(), nullable=False),
        StructField("implementation_id", StringType(), nullable=False),
        StructField("test_id", StringType(), nullable=False),
        StructField("implementation_hash", StringType(), nullable=False),
        StructField("test_hash", StringType(), nullable=False),
        StructField("run_id", StringType(), nullable=False),
        StructField("environment_id", StringType(), nullable=False),
        StructField("step_id", IntegerType(), nullable=False),
        StructField("operation", StringType(), nullable=True),
        StructField("inputs", StringType(), nullable=True),
        StructField("output", StringType(), nullable=True),
        StructField("execution_time_ms", DoubleType(), nullable=True),
        StructField("memory_used_mb", DoubleType(), nullable=True),
        StructField("branch_coverage_percent", DoubleType(), nullable=True),
        StructField("created_at", TimestampNTZType(), nullable=True),
        StructField("git_commit_hash", StringType(), nullable=True),
        StructField("ci_pipeline_id", StringType(), nullable=True),
        StructField("researcher_name", StringType(), nullable=True),
        StructField("specified_oracle", BooleanType(), nullable=True),
    ]
)

# reference: olake/lakehouse.py:90-107
CODE_IMPLEMENTATIONS_SCHEMA = StructType(
    [
        StructField("data_set_id", StringType(), nullable=False),
        StructField("problem_id", StringType(), nullable=False),
        StructField("implementation_id", StringType(), nullable=False),
        StructField("source_code", StringType(), nullable=False),
        StructField("code_hash", StringType(), nullable=True),
        StructField("created_at", TimestampNTZType(), nullable=True),
        StructField("lines_of_code", IntegerType(), nullable=True),
        StructField("cyclomatic_complexity", IntegerType(), nullable=True),
        StructField("language", StringType(), nullable=True),
    ]
)

# reference: olake/lakehouse.py:109-127 (field ids skip the commented metrics)
TESTS_SCHEMA = StructType(
    [
        StructField("data_set_id", StringType(), nullable=False),
        StructField("problem_id", StringType(), nullable=False),
        StructField("test_id", StringType(), nullable=False),
        StructField("source_code", StringType(), nullable=False),
        StructField("focal_interface", StringType(), nullable=False),
        StructField("code_hash", StringType(), nullable=True),
        StructField("created_at", TimestampNTZType(), nullable=True),
        StructField("language", StringType(), nullable=True),
    ]
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "observations": OBSERVATIONS_SCHEMA,
    "code_implementations": CODE_IMPLEMENTATIONS_SCHEMA,
    "tests": TESTS_SCHEMA,
}

# Raw LASSO-arena cell export consumed by ingestion (reference: olake/ingest/arena.py:72-188).
ARENA_EXPORT_SCHEMA = StructType(
    [
        StructField("EXECUTIONID", StringType(), True),
        StructField("ABSTRACTIONID", StringType(), True),
        StructField("SYSTEMID", StringType(), True),
        StructField("VARIANTID", StringType(), True),
        StructField("ADAPTERID", StringType(), True),
        StructField("SHEETID", StringType(), True),
        StructField("ARENAID", StringType(), True),
        StructField("X", IntegerType(), True),
        StructField("Y", IntegerType(), True),
        StructField("TYPE", StringType(), True),
        StructField("VALUE", StringType(), True),
        StructField("EXECUTIONTIME", DoubleType(), True),
    ]
)
