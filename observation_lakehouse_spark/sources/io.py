"""Readers and writers around the lakehouse (SURVEY.md §2.1).

- S1 glob Parquet scan → :func:`read_arena_export` (schema-pinned so a corrupt
  export fails loudly instead of inferring a wrong schema).
- S4 Solr JSON source → :func:`read_solr_docs` (``spark.read.json`` + explode —
  distributed, unlike the reference's driver-side ``json.load`` at
  /root/reference/olake/ingest/arena.py:257-269).
- S9 CSV sink → :func:`write_csv`.
- S10 pandas interchange → :func:`to_pandas` (Arrow-backed).
- Partitioned Parquet layout (the identity-partition physical design,
  reference README.md:95-112) → :func:`write_partitioned_parquet`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from observation_lakehouse_spark.schemas import ARENA_EXPORT_SCHEMA, PARTITION_COLUMNS


def read_arena_export(spark: SparkSession, parquet_glob: str) -> DataFrame:
    """Multi-file arena export scan with the pinned cell schema (S1)."""
    return spark.read.schema(ARENA_EXPORT_SCHEMA).parquet(parquet_glob)


def read_solr_docs(spark: SparkSession, json_path: str) -> DataFrame:
    """Solr response envelope → one row per doc (S4)."""
    raw = spark.read.option("multiLine", "true").json(json_path)
    return raw.select(F.explode(F.col("response.docs")).alias("d")).select("d.*")


def write_partitioned_parquet(df: DataFrame, path: str, mode: str = "append") -> None:
    """Identity-partitioned layout on (data_set_id, problem_id) — the design the
    reference credits for sub-100 ms per-problem scans (S5/S6 fallback path when
    no catalog table format is configured)."""
    df.write.mode(mode).partitionBy(*PARTITION_COLUMNS).parquet(path)


def union_datasets(*dfs: DataFrame) -> DataFrame:
    """Multi-dataset integration (SURVEY.md §2.7).

    The reference integrates datasets purely by appending rows with different
    ``data_set_id`` values (lasso_arena_ingest.py:24-72); when sources have
    drifted schemas (a column added by evolution), ``unionByName`` with
    ``allowMissingColumns`` aligns by name and NULL-fills — the Spark-native
    equivalent that keeps working across schema evolution.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Benchmark-results CSV sink (S9)."""
    df.write.mode(mode).option("header", "true").csv(path)


def to_pandas(df: DataFrame) -> pd.DataFrame:
    """Arrow-backed pandas interchange (S10) — session conf enables Arrow."""
    return df.toPandas()


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (interchange with Hive-ecosystem consumers; columnar like
    Parquet, same predicate-pushdown/column-pruning behavior in Spark's
    native vectorized ORC reader)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — vectorized, filter-pushdown-capable (pair of
    :func:`write_orc`)."""
    return spark.read.orc(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line — the interchange format most
    annotation/labeling tools and LLM data tooling consume)."""
    df.write.mode(mode).json(path)


def read_json_lines(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Pass ``schema`` in production: schema inference
    reads the data twice and infers loosely (everything nullable, ints that
    look like longs) — at 100 TB the extra pass is a full scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
