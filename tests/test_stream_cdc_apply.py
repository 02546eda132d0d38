"""Streaming CDC apply into AtomicParquetTable (streaming/cdc_apply.py)."""

from __future__ import annotations

from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.streaming.cdc_apply import stream_cdc_apply
from observation_lakehouse_spark.transaction import AtomicParquetTable

SCHEMA = "k long, v string"
CHANGE_SCHEMA = "k long, v string, seq long, deleted boolean"


def _run(spark, table, landing, ckpt):
    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(str(landing))
    q = stream_cdc_apply(
        table, stream, keys=["k"], order_by=["seq"], delete_col="deleted",
        checkpoint=str(ckpt), available_now=True,
    )
    q.awaitTermination(120)


def test_stream_cdc_apply_merges_batches(spark, tmp_path):
    table = AtomicParquetTable(
        spark, str(tmp_path / "t"), schema=_parse_datatype_string(SCHEMA)
    )
    table.append(spark.createDataFrame([(1, "one"), (2, "two")], SCHEMA))
    landing = tmp_path / "landing"
    spark.createDataFrame(
        [
            (1, "ONE", 1, False),    # upsert
            (2, "gone", 1, True),    # delete
            (3, "three", 1, False),  # insert
            (3, "THREE", 2, False),  # newer version in the same batch
        ],
        CHANGE_SCHEMA,
    ).write.parquet(str(landing))

    _run(spark, table, landing, tmp_path / "ckpt")
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: "ONE", 3: "THREE"}

    # exactly-once: re-running the stream over the same checkpoint changes
    # nothing (no new snapshot commits either)
    v_before = table.latest_version()
    _run(spark, table, landing, tmp_path / "ckpt")
    assert table.latest_version() == v_before
    assert {r["k"]: r["v"] for r in table.read().collect()} == {1: "ONE", 3: "THREE"}

    # the pre-merge snapshot stays time-travelable (copy-on-write MERGE)
    assert {r["k"] for r in table.read(version=1).collect()} == {1, 2}


def test_stream_cdc_apply_agrees_with_batch_apply_changes(spark, tmp_path):
    """Twin agreement (VERDICT r03 item 6): the streaming CDC apply must land
    EXACTLY the state the oracle-checked batch operator (operators.cdc.
    apply_changes, the engine behind the `cdc_upsert` query) produces from
    the same base + change set — same rows, same values."""
    from observation_lakehouse_spark.operators.cdc import apply_changes

    base_rows = [(k, f"v{k}") for k in range(1, 21)]
    change_rows = (
        [(k, f"stale{k}", 0, False) for k in range(1, 21, 4)]
        + [(k, f"new{k}", 2, False) for k in range(1, 21, 2)]
        + [(k, f"dead{k}", 3, True) for k in range(1, 21, 5)]
        + [(99, "insert", 1, False), (99, "insert2", 2, False)]
    )
    base_df = spark.createDataFrame(base_rows, SCHEMA)
    changes_df = spark.createDataFrame(change_rows, CHANGE_SCHEMA)
    expected = sorted(
        (r["k"], r["v"])
        for r in apply_changes(
            base_df, changes_df, keys=["k"], order_by=["seq"], delete_col="deleted"
        ).collect()
    )

    table = AtomicParquetTable(
        spark, str(tmp_path / "t"), schema=_parse_datatype_string(SCHEMA)
    )
    table.append(base_df)
    landing = tmp_path / "landing"
    changes_df.write.parquet(str(landing))
    _run(spark, table, landing, tmp_path / "ckpt")
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    assert got == expected


def test_stream_merge_into_merge_on_read(spark, tmp_path):
    """The merge-on-read streaming twin: upserts via DV+rewrite MERGE,
    tombstones via matched-delete MERGE, exactly-once under replay."""
    from pyspark.sql.types import _parse_datatype_string

    from observation_lakehouse_spark.streaming.cdc_apply import stream_merge_into
    from observation_lakehouse_spark.transaction import AtomicParquetTable

    schema = "k bigint, v string"
    chg_schema = "k bigint, v string, seq bigint, deleted boolean"
    table = AtomicParquetTable(
        spark, str(tmp_path / "t"), schema=_parse_datatype_string(schema)
    )
    table.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))
    landing = tmp_path / "landing"
    batch1 = [
        (2, "b2", 1, False),  # update
        (4, "d", 1, False),   # insert
        (3, None, 1, True),   # delete
        (2, "b1-stale", 0, False),  # older change, newest-wins drops it
    ]
    spark.createDataFrame(batch1, chg_schema).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(chg_schema).parquet(str(landing) + "/*")
    q = stream_merge_into(
        table, stream, keys=["k"], order_by=["seq"], delete_col="deleted",
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}
    # deletes live as DVs, not rewrites of untouched files
    assert table._manifest(table.latest_version()).get("deletes")

    # replaying the same files through the same checkpoint is a no-op
    v = table.latest_version()
    stream = spark.readStream.schema(chg_schema).parquet(str(landing) + "/*")
    q = stream_merge_into(
        table, stream, keys=["k"], order_by=["seq"], delete_col="deleted",
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    assert table.latest_version() == v
    assert {r["k"]: r["v"] for r in table.read().collect()} == got
