"""Custom Python Data Source for Solr exports (sources/solr_datasource.py)."""

from __future__ import annotations

import json

import pytest

from observation_lakehouse_spark.sources.solr_datasource import SolrExportDataSource


def _envelope(docs):
    return json.dumps({"response": {"docs": docs}})


@pytest.fixture()
def export_dir(tmp_path):
    d = tmp_path / "exports"
    d.mkdir()
    (d / "a.json").write_text(_envelope([
        {"id": "u1", "abstractionId": ["p_000"], "lang": "Java",
         "content": "class A {}", "m_static_loc_td": [12], "m_static_complexity_td": [3]},
        {"id": "u2", "abstractionId": ["p_001"], "lang": "PYTHON",
         "content": "def b(): pass", "m_static_loc_td": [7], "m_static_complexity_td": [1]},
    ]))
    (d / "b.json").write_text(_envelope([
        {"id": "u3", "abstractionId": ["p_000"], "lang": "java",
         "content": "class C {}", "m_static_loc_td": [4], "m_static_complexity_td": [2]},
    ]))
    (d / "ignored.txt").write_text("not json")
    return str(d)


def test_reads_directory_distributed(spark, export_dir):
    spark.dataSource.register(SolrExportDataSource)
    df = spark.read.format("solr_export").load(export_dir)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"]["problem_id"] == "p_000"
    assert rows["u2"]["lang"] == "python"  # normalized lowercase
    assert rows["u3"]["lines_of_code"] == 4
    # one partition per envelope file
    assert df.rdd.getNumPartitions() == 2


def test_equality_filter_pushdown(spark, export_dir):
    spark.dataSource.register(SolrExportDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.read.format("solr_export").load(export_dir).filter("lang = 'java'")
    assert {r["id"] for r in df.collect()} == {"u1", "u3"}
    # non-pushable predicates still work (re-applied above the scan)
    df2 = (
        spark.read.format("solr_export").load(export_dir)
        .filter("lines_of_code > 5 AND lang = 'java'")
    )
    assert {r["id"] for r in df2.collect()} == {"u1"}
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_missing_path_fails_loudly(spark):
    spark.dataSource.register(SolrExportDataSource)
    with pytest.raises(Exception, match="path"):
        spark.read.format("solr_export").schema("id string").load().collect()
