"""Streaming retraction MV maintenance (streaming/mv_refresh.py r12): a
change-feed file stream (insert/delete rows) folds into an extrema_k
IncrementalAggregate exactly once; final state == one-shot COUNT/MIN/MAX
over the live rows — the streaming leg of the counting algorithm with the
r12 admission-threshold frontiers."""

from __future__ import annotations

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import (
    stream_mv_refresh_retractions,
)
from observation_lakehouse_spark.transaction import AtomicParquetTable

FEED_SCHEMA = "k string, v double, _change_type string"
SRC_SCHEMA = "k string, v double"


def _mv(spark, path):
    return IncrementalAggregate(
        spark,
        str(path),
        keys=["k"],
        aggs={"n": ("count", "1"), "lo": ("min", "v"), "hi": ("max", "v")},
        agg_types={"lo": "double", "hi": "double"},
        extrema_k=2,
    )


def _run(spark, mv, landing, ckpt, source=None):
    stream = spark.readStream.schema(FEED_SCHEMA).parquet(str(landing))
    q = stream_mv_refresh_retractions(
        mv, stream, source=source, checkpoint=str(ckpt), available_now=True
    )
    q.awaitTermination(120)


def test_stream_retraction_mv_with_frontier_drain_and_replay(spark, tmp_path):
    """Batch 1 inserts, batch 2 drains group a's lo frontier (forcing the
    scoped recompute through the lazily-consulted source) AND inserts past
    the admission threshold; state equals the live-row aggregate, and a
    checkpoint replay is a no-op."""
    from pyspark.sql.types import _parse_datatype_string

    src = AtomicParquetTable(
        spark, str(tmp_path / "src"),
        schema=_parse_datatype_string(SRC_SCHEMA),
    )
    mv = _mv(spark, tmp_path / "mv")
    landing = tmp_path / "landing"
    ins = [("a", float(v), "insert") for v in (1, 2, 3, 4)] + [
        ("b", 5.0, "insert")
    ]
    spark.createDataFrame(ins, FEED_SCHEMA).write.parquet(str(landing / "f1"))
    src.append(spark.createDataFrame(
        [(k, v) for k, v, _ in ins], SRC_SCHEMA
    ))
    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt", source=src.read)
    got = {r["k"]: (r["n"], r["lo"], r["hi"]) for r in mv.read().collect()}
    assert got == {"a": (4, 1.0, 4.0), "b": (1, 5.0, 5.0)}

    # drain a's tracked lo frontier {1,2} and insert 10 (beyond the
    # admission threshold — the r11 ADVICE shape, now through streaming)
    feed2 = [("a", 1.0, "delete"), ("a", 2.0, "delete"), ("a", 10.0, "insert")]
    spark.createDataFrame(feed2, FEED_SCHEMA).write.parquet(str(landing / "f2"))
    src.delete_where("k = 'a' AND v <= 2.0")
    src.append(spark.createDataFrame([("a", 10.0)], SRC_SCHEMA))
    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt", source=src.read)
    got = {r["k"]: (r["n"], r["lo"], r["hi"]) for r in mv.read().collect()}
    assert got == {"a": (3, 3.0, 10.0), "b": (1, 5.0, 5.0)}

    # exactly-once: restart over the same checkpoint -> no state change
    v = mv.table.latest_version()
    _run(spark, mv, str(landing) + "/*", tmp_path / "ckpt", source=src.read)
    assert mv.table.latest_version() == v
    assert {r["k"]: (r["n"], r["lo"], r["hi"]) for r in mv.read().collect()} == got
