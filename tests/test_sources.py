"""ORC / JSON-lines source-sink round trips (sources/io.py)."""

from __future__ import annotations


def test_orc_round_trip(spark, tmp_path):
    from observation_lakehouse_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    p = str(tmp_path / "orc_out")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.schema == df.schema
    assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_orc_filter_pushdown_reaches_scan(spark, tmp_path):
    from observation_lakehouse_spark.sources.io import read_orc, write_orc

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    p = str(tmp_path / "orc_push")
    write_orc(df, p)
    plan = read_orc(spark, p).filter("id > 50")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,50)]" in plan


def test_json_lines_round_trip(spark, tmp_path):
    from observation_lakehouse_spark.sources.io import read_json_lines, write_json_lines

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    p = str(tmp_path / "jsonl_out")
    write_json_lines(df, p)
    back = read_json_lines(spark, p, schema="id long, s string")
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b")]
