"""LASSO-arena ingestion, Spark-first (SURVEY.md §3 E1, §2.1-2.2, §2.10).

The raw export is a cell-level sparse matrix: one Parquet row per sheet cell with
coordinates (X = column, Y = step row, Y = -1 for metadata rows) and a TYPE tag
(reference /root/reference/olake/ingest/arena.py:72-188). Three reshapes:

- ``reshape_observations`` — group cells into execution steps; inputs/outputs are
  the X-ordered comma-joined cell values (DuckDB ``STRING_AGG(... ORDER BY X)``,
  arena.py:83-90 → :func:`ordered_string_agg`); operation/time via conditional
  MAX; implementation_id minted as ``SYSTEMID_VARIANT_ADAPTERID`` with the
  ``COALESCE(NULLIF(VARIANTID,''),'default')`` quirk (arena.py:105).
- ``reshape_tests`` — metadata rows (Y = -1) pivoted to one row per sheet with
  stimulussheet → source_code, interface → focal_interface; sheets without a
  stimulussheet are dropped (HAVING-style post-agg filter, arena.py:186-187);
  ``code_hash`` = git blob hash (vectorized pandas UDF, not the reference's
  per-row Arrow loop at arena.py:205-217).
- ``reshape_code_implementations`` — Solr JSON export → records. Pure column ops
  (``element_at`` on the single-element metric arrays, ``lower`` on lang); the
  only UDF is the git blob hash.

Known reference quirks reproduced faithfully (SURVEY.md §7.3.8):
- ``specified_oracle`` is constant FALSE: the aggregate tests ``SYSTEMID='oracle'``
  but the WHERE clause already removed those rows (arena.py:93 vs :98).
- ``implementation_hash`` / ``test_hash`` ingested as ``''`` (arena.py:108-109).

Determinism: ``created_at`` is injectable (``ingested_at`` param) because
``current_timestamp()`` breaks differential tests (SURVEY.md §7.3.5); None keeps
the reference's CURRENT_TIMESTAMP behavior.

Scale: each reshape is a single hash aggregation keyed by the sheet coordinates —
map-side partial aggregation applies, no Python in the hot path except the
Arrow-batched hash on the (small) tests/code dimensions.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.hashing import git_blob_hash_udf
from observation_lakehouse_spark.functions.ordered_agg import ordered_string_agg


def _created_at(ingested_at: _dt.datetime | None):
    if ingested_at is None:
        # current_timestamp() is TIMESTAMP (ltz); table column is ntz.
        return F.current_timestamp().cast("timestamp_ntz")
    return F.lit(ingested_at).cast("timestamp_ntz")


def reshape_observations(
    cells: DataFrame,
    data_set_id: str = "Arena",
    ingested_at: _dt.datetime | None = None,
) -> DataFrame:
    """Arena cells → ``observations`` rows (arena.py:58-123 semantics)."""
    grouped = (
        cells.filter((F.col("Y") > -1) & (F.col("SYSTEMID") != "oracle"))
        .groupBy(
            "EXECUTIONID",
            "ABSTRACTIONID",
            "SYSTEMID",
            "VARIANTID",
            "ADAPTERID",
            "SHEETID",
            "ARENAID",
            F.col("Y").alias("step_id"),
        )
        .agg(
            ordered_string_agg(
                "VALUE", "X", ",", filter_cond=F.col("TYPE") == "input_value"
            ).alias("inputs_array"),
            ordered_string_agg(
                "VALUE", "X", ",", filter_cond=F.col("TYPE") == "value"
            ).alias("outputs_array"),
            F.max(F.when(F.col("TYPE") == "op", F.col("VALUE"))).alias("operation"),
            F.max("EXECUTIONTIME").alias("execution_time"),
            # Always FALSE post-filter — reference quirk kept on purpose.
            F.max(F.col("SYSTEMID") == "oracle").alias("specified_oracle"),
        )
    )
    return grouped.select(
        F.lit(data_set_id).alias("data_set_id"),
        F.col("ABSTRACTIONID").alias("problem_id"),
        F.concat_ws(
            "_",
            F.col("SYSTEMID"),
            F.coalesce(F.nullif(F.col("VARIANTID"), F.lit("")), F.lit("default")),
            F.col("ADAPTERID"),
        ).alias("implementation_id"),
        F.col("SHEETID").alias("test_id"),
        F.lit("").alias("implementation_hash"),
        F.lit("").alias("test_hash"),
        F.col("EXECUTIONID").alias("run_id"),
        F.col("ARENAID").alias("environment_id"),
        F.col("step_id").cast("int").alias("step_id"),
        "operation",
        F.col("inputs_array").alias("inputs"),
        F.col("outputs_array").alias("output"),
        F.col("execution_time").cast("double").alias("execution_time_ms"),
        F.lit(None).cast("double").alias("memory_used_mb"),
        F.lit(None).cast("double").alias("branch_coverage_percent"),
        _created_at(ingested_at).alias("created_at"),
        F.lit(None).cast("string").alias("git_commit_hash"),
        F.lit(None).cast("string").alias("ci_pipeline_id"),
        F.lit(None).cast("string").alias("researcher_name"),
        "specified_oracle",
    )


def reshape_tests(
    cells: DataFrame,
    data_set_id: str = "Arena",
    ingested_at: _dt.datetime | None = None,
) -> DataFrame:
    """Arena metadata cells → ``tests`` rows (arena.py:155-188 semantics)."""
    grouped = (
        cells.filter(
            (F.col("Y") == -1)
            & (F.col("SYSTEMID") == "abstraction")
            & (F.col("TYPE").isin("stimulussheet", "interface"))
        )
        .groupBy("EXECUTIONID", "ABSTRACTIONID", "SHEETID")
        .agg(
            F.max(F.when(F.col("TYPE") == "stimulussheet", F.col("VALUE"))).alias(
                "source_code"
            ),
            F.max(F.when(F.col("TYPE") == "interface", F.col("VALUE"))).alias(
                "focal_interface"
            ),
        )
        .filter(F.col("source_code").isNotNull())
    )
    return grouped.select(
        F.lit(data_set_id).alias("data_set_id"),
        F.col("ABSTRACTIONID").alias("problem_id"),
        F.col("SHEETID").alias("test_id"),
        "source_code",
        "focal_interface",
        git_blob_hash_udf(F.col("source_code")).alias("code_hash"),
        _created_at(ingested_at).alias("created_at"),
        F.lit("java").alias("language"),
    )


def reshape_code_implementations(
    spark_or_docs: SparkSession | DataFrame,
    json_path: str | None = None,
    data_set_id: str = "Arena",
    ingested_at: _dt.datetime | None = None,
) -> DataFrame:
    """Solr JSON export → ``code_implementations`` rows (arena.py:244-333 semantics).

    Pass either a SparkSession + path to the Solr export, or a DataFrame of
    already-exploded docs (columns: id, abstractionId, lang, content,
    m_static_loc_td, m_static_complexity_td).
    """
    if isinstance(spark_or_docs, DataFrame):
        docs = spark_or_docs
    else:
        # Solr response envelope: {"response": {"docs": [...]}}. multiLine handles
        # the pretty-printed single-document export.
        raw = spark_or_docs.read.option("multiLine", "true").json(json_path)
        docs = raw.select(F.explode(F.col("response.docs")).alias("d")).select("d.*")

    return docs.select(
        F.lit(data_set_id).alias("data_set_id"),
        F.element_at(F.col("abstractionId"), 1).alias("problem_id"),
        F.concat(F.col("id"), F.lit("_original_0")).alias("implementation_id"),
        F.coalesce(F.col("content"), F.lit("")).alias("source_code"),
        git_blob_hash_udf(F.coalesce(F.col("content"), F.lit(""))).alias("code_hash"),
        _created_at(ingested_at).alias("created_at"),
        F.element_at(F.col("m_static_loc_td"), 1).cast("int").alias("lines_of_code"),
        F.element_at(F.col("m_static_complexity_td"), 1)
        .cast("int")
        .alias("cyclomatic_complexity"),
        F.lower(F.coalesce(F.col("lang"), F.lit(""))).alias("language"),
    )
