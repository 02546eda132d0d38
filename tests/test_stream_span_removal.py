"""Streaming span removal (streaming/dedup.py:remove_dup_spans_stream):
batch-twin agreement (one batch over empty standing state == the batch
operator), cross-batch gram memory through the atomic gram-count table
(read-your-writes), and a checkpoint replay that appends nothing twice."""

from __future__ import annotations

from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.operators.dedup import remove_dup_spans
from observation_lakehouse_spark.streaming.dedup import remove_dup_spans_stream
from observation_lakehouse_spark.transaction import AtomicParquetTable

SCHEMA = "doc_id bigint, text string"
OUT_SCHEMA = "doc_id bigint, n_tokens int, n_removed int, clean_text string"
GRAM_SCHEMA = "gram bigint, n bigint"

NGRAM = 4
BOILER = "alpha beta gamma delta"  # exactly one 4-token window
UNIQUE1 = "one two three four five six"
UNIQUE2 = "seven eight nine ten eleven twelve"


def _tables(spark, tmp_path):
    gram_table = AtomicParquetTable(
        spark, str(tmp_path / "grams"), schema=_parse_datatype_string(GRAM_SCHEMA)
    )
    out_table = AtomicParquetTable(
        spark, str(tmp_path / "cleaned"), schema=_parse_datatype_string(OUT_SCHEMA)
    )
    return gram_table, out_table


def _run(spark, gram_table, out_table, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    q = remove_dup_spans_stream(
        stream,
        gram_table,
        out_table,
        checkpoint=str(ckpt),
        ngram=NGRAM,
        available_now=True,
    )
    q.awaitTermination(180)


def _rows(table):
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in table.read().collect()
    }


def test_single_batch_agrees_with_batch_operator(spark, tmp_path):
    docs = [
        (1, f"{UNIQUE1} {BOILER}"),
        (2, f"{BOILER} {UNIQUE2}"),
        (3, "short doc"),
        (4, UNIQUE2),  # duplicates doc 2's tail -> covered in both docs
    ]
    batch_expected = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_dup_spans(
            spark.createDataFrame(docs, SCHEMA), "text", "doc_id", NGRAM
        ).collect()
    }
    gram_table, out_table = _tables(spark, tmp_path)
    landing = tmp_path / "landing"
    spark.createDataFrame(docs, SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, gram_table, out_table, str(landing) + "/*", tmp_path / "ckpt")
    assert _rows(out_table) == batch_expected
    # sanity on the fixture itself: the shared boilerplate was actually cut
    assert batch_expected[1][1] > 0 and batch_expected[2][1] > 0


def test_cross_batch_memory_and_replay(spark, tmp_path):
    gram_table, out_table = _tables(spark, tmp_path)
    landing = tmp_path / "landing"
    ckpt = tmp_path / "ckpt"

    # batch 1: two unique docs — nothing covered, grams remembered
    spark.createDataFrame(
        [(10, UNIQUE1), (11, UNIQUE2)], SCHEMA
    ).write.parquet(str(landing / "f1"))
    _run(spark, gram_table, out_table, str(landing) + "/*", ckpt)
    rows = _rows(out_table)
    assert rows[10] == (6, 0, UNIQUE1) and rows[11] == (6, 0, UNIQUE2)

    # batch 2: a full duplicate of batch 1's doc (every window already in the
    # standing table -> fully cut) plus a fresh unique doc; batch 1's rows
    # are NOT retro-cleaned (the stated admission-time trade)
    spark.createDataFrame(
        [(20, UNIQUE1), (21, "totally fresh words appearing here only")], SCHEMA
    ).write.parquet(str(landing / "f2"))
    _run(spark, gram_table, out_table, str(landing) + "/*", ckpt)
    rows = _rows(out_table)
    assert rows[20] == (6, 6, "")
    assert rows[21][1] == 0
    assert rows[10] == (6, 0, UNIQUE1)  # unchanged

    # replay over the same checkpoint: neither cleaned rows nor gram counts
    # append twice (a gram double-count would poison later batches)
    v_out, v_gram = out_table.latest_version(), gram_table.latest_version()
    _run(spark, gram_table, out_table, str(landing) + "/*", ckpt)
    assert out_table.latest_version() == v_out
    assert gram_table.latest_version() == v_gram
    assert _rows(out_table) == rows

    # batch 3 still sees batch-1/2 grams after the replay: another copy of
    # UNIQUE2 is fully cut
    spark.createDataFrame([(30, UNIQUE2)], SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, gram_table, out_table, str(landing) + "/*", ckpt)
    assert _rows(out_table)[30] == (6, 6, "")
