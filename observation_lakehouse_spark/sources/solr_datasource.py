"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) for Solr
export directories — the reference's upstream source format (reference
olake/ingest/arena.py:257-269 loads these envelopes driver-side with
``json.load``; here each file is an input partition parsed on executors).

Usage::

    spark.dataSource.register(SolrExportDataSource)
    df = spark.read.format("solr_export").load("/path/to/exports")

Design:

- **One InputPartition per envelope file**: the driver only lists the
  directory; JSON parsing and doc flattening run distributed, so a million
  export files fan out across the cluster instead of serializing through the
  driver (the failure mode the reference's ``json.load`` loop hits first).
- **Pinned schema**: a corrupt export fails loudly instead of silently
  inferring a different shape (same policy as sources.read_arena_export).
- **Filter pushdown**: equality filters on ``lang`` / ``problem_id`` are
  absorbed by :meth:`pushFilters` and applied inside the partition reader,
  before rows are handed to the JVM — the Python-source analogue of
  parquet's PushedFilters.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SOLR_EXPORT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("problem_id", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("lines_of_code", IntegerType()),
        StructField("cyclomatic_complexity", IntegerType()),
    ]
)

_PUSHABLE = {"lang", "problem_id"}


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class SolrExportReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("solr_export requires a path (directory or file)")
        self.path = path
        self.eq_filters: dict[str, str] = {}

    def partitions(self) -> list[_FilePartition]:
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".json")
            )
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path) as fh:
            envelope = json.load(fh)
        eq = self.eq_filters
        for doc in envelope.get("response", {}).get("docs", []):
            abstraction = doc.get("abstractionId") or [None]
            lang = (doc.get("lang") or "").lower() or None
            problem_id = abstraction[0]
            if "lang" in eq and lang != eq["lang"]:
                continue
            if "problem_id" in eq and problem_id != eq["problem_id"]:
                continue
            loc = doc.get("m_static_loc_td") or [None]
            cpx = doc.get("m_static_complexity_td") or [None]
            yield (
                doc.get("id"),
                problem_id,
                lang,
                doc.get("content"),
                loc[0],
                cpx[0],
            )


class PushdownSolrExportReader(SolrExportReader):
    """The pushdown-capable variant. Spark REFUSES any reader that overrides
    ``pushFilters`` while ``spark.sql.python.filterPushdown.enabled`` is
    false, so the capability lives in a subclass and the data source picks
    per-session (plain readers everywhere, pushdown where the conf is on)."""

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute[0] in _PUSHABLE:
                self.eq_filters[f.attribute[0]] = f.value
            else:
                yield f  # unsupported → Spark re-applies it above the scan


class SolrExportDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "solr_export"

    def schema(self) -> StructType:
        return SOLR_EXPORT_SCHEMA

    def reader(self, schema: StructType) -> SolrExportReader:
        from pyspark.sql import SparkSession

        session = SparkSession.getActiveSession()
        enabled = (
            session is not None
            and session.conf.get("spark.sql.python.filterPushdown.enabled", "false")
            == "true"
        )
        cls = PushdownSolrExportReader if enabled else SolrExportReader
        return cls(self.options)
