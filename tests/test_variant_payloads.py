"""Spark 4 VARIANT for the semi-structured payloads (SURVEY.md §1.1 stretch).

The reference stores `inputs`/`output` as JSON-serialized strings and calls
the serialization protocol a known limitation (reference README.md:161).
StringType stays the table contract for fidelity; these tests demonstrate the
Spark-4-native introspection paths over those strings: `get_json_object` /
`from_json` and the VARIANT type (`parse_json` + `variant_get`), which keeps
shredded binary JSON instead of text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def payloads(spark):
    return spark.createDataFrame(
        [
            (1, '{"value": 42, "items": [1, 2, 3], "tag": "ok"}'),
            (2, '{"value": -1, "items": [], "tag": "err"}'),
            (3, None),
        ],
        "obs_id int, output string",
    )


def test_variant_parse_and_get(payloads):
    out = payloads.filter(F.col("output").isNotNull()).select(
        "obs_id",
        F.parse_json("output").alias("v"),
    )
    got = {
        r["obs_id"]: (r["value"], r["first_item"], r["tag"])
        for r in out.select(
            "obs_id",
            F.variant_get(F.col("v"), "$.value", "int").alias("value"),
            F.variant_get(F.col("v"), "$.items[0]", "int").alias("first_item"),
            F.variant_get(F.col("v"), "$.tag", "string").alias("tag"),
        ).collect()
    }
    assert got == {1: (42, 1, "ok"), 2: (-1, None, "err")}


def test_try_parse_json_on_garbage(spark):
    df = spark.createDataFrame([("not json",), ('{"k":1}',)], "s string")
    out = df.select(F.try_parse_json("s").alias("v")).collect()
    assert out[0]["v"] is None and out[1]["v"] is not None


def test_from_json_typed_struct(payloads):
    schema = "value int, items array<int>, tag string"
    out = payloads.select("obs_id", F.from_json("output", schema).alias("o")).collect()
    by_id = {r["obs_id"]: r["o"] for r in out}
    assert by_id[1]["items"] == [1, 2, 3]
    assert by_id[2]["value"] == -1
    assert by_id[3] is None
