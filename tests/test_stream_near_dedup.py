"""Streaming near-dup admission (streaming/dedup.py:near_dedup_admit_stream):
micro-batches admit against static corpus + previously-admitted rows
(read-your-writes through the atomic table), intra-batch near-dups resolve
lowest-id-wins, and a checkpoint replay admits nothing twice."""

from __future__ import annotations

from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.streaming.dedup import near_dedup_admit_stream
from observation_lakehouse_spark.transaction import AtomicParquetTable

SCHEMA = "doc_id bigint, text string"

BOILER = "the quick brown fox jumps over the lazy dog again and again"


def _run(spark, corpus, table, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    q = near_dedup_admit_stream(
        stream,
        corpus,
        table,
        checkpoint=str(ckpt),
        threshold=0.5,
        available_now=True,
        num_hashes=64,
        bands=16,
    )
    q.awaitTermination(180)


def test_near_dedup_stream_admits_across_batches(spark, tmp_path):
    corpus = spark.createDataFrame([(1, BOILER)], SCHEMA)
    table = AtomicParquetTable(
        spark, str(tmp_path / "admitted"), schema=_parse_datatype_string(SCHEMA)
    )
    landing = tmp_path / "landing"
    novel = "completely different corpus content about spark execution plans"
    # batch 1: a corpus near-dup (reject), a novel doc (admit), and an
    # intra-batch near-dup pair (only the smaller id survives to face the
    # corpus)
    spark.createDataFrame(
        [
            (10, BOILER),
            (11, novel),
            (12, novel + " suffix"),
        ],
        SCHEMA,
    ).write.parquet(str(landing / "f1"))
    _run(spark, corpus, table, str(landing) + "/*", tmp_path / "ckpt")
    assert sorted(r["doc_id"] for r in table.read().collect()) == [11]

    # batch 2: a near-dup of the doc ADMITTED in batch 1 (reject —
    # read-your-writes against the standing corpus), plus a new novel doc
    spark.createDataFrame(
        [
            (20, novel),
            (21, "entirely new subject matter with nothing shared at all"),
        ],
        SCHEMA,
    ).write.parquet(str(landing / "f2"))
    _run(spark, corpus, table, str(landing) + "/*", tmp_path / "ckpt")
    assert sorted(r["doc_id"] for r in table.read().collect()) == [11, 21]

    # replay over the same checkpoint: nothing admitted twice
    v = table.latest_version()
    _run(spark, corpus, table, str(landing) + "/*", tmp_path / "ckpt")
    assert table.latest_version() == v
    assert sorted(r["doc_id"] for r in table.read().collect()) == [11, 21]
