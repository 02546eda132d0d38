"""Streaming PSI monitor (streaming/drift.py): the derived report must
equal psi_drift(ref, delivered rows) bit-for-bit, survive checkpoint
replay, and fold late files incrementally."""

from __future__ import annotations

from observation_lakehouse_spark.streaming.drift import StreamingPsiMonitor

SCHEMA = "event_id long, value double"

REF = [(i, ((i * 17) % 500) / 1.0) for i in range(400)]
ROWS1 = [(i, ((i * 13) % 500) / 1.0) for i in range(300)]
ROWS2 = [(500 + i, 450.0 + (i % 50)) for i in range(200)]  # shifted tail mass
ROWS3 = [(900 + i, 600.0) for i in range(10)]  # above hi: clamps to last bin


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch(spark, rows):
    from observation_lakehouse_spark.operators.audit import psi_drift

    ref = spark.createDataFrame(REF, SCHEMA)
    cur = spark.createDataFrame(rows, SCHEMA)
    return [
        tuple(r)
        for r in psi_drift(ref, cur, "value", 0.0, 500.0, n_bins=10).collect()
    ]


def test_stream_psi_matches_batch_and_replays_safely(spark, tmp_path):
    ref = spark.createDataFrame(REF, SCHEMA)
    mon = StreamingPsiMonitor(
        spark, str(tmp_path / "state"), ref, "value", 0.0, 500.0, n_bins=10
    )
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert [tuple(r) for r in mon.report().collect()] == _batch(
        spark, ROWS1 + ROWS2
    )
    # the shifted tail mass registers as positive drift
    assert sum(r.psi_contrib_micro for r in mon.report().collect()) > 50_000

    # exactly-once: replay must not inflate any bin
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late + out-of-range rows clamp into the last bin, still batch-exact
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert [tuple(r) for r in mon.report().collect()] == _batch(
        spark, ROWS1 + ROWS2 + ROWS3
    )
    assert mon.mv.read().count() <= 10


def test_stream_term_drift_matches_batch_and_bounds_state(spark, tmp_path):
    """r9 StreamingTermDriftMonitor: for every FROZEN term the report row is
    bit-identical to jsd_term_divergence(ref, delivered) — token totals
    agree because __other__ still counts its tokens; state stays O(top_k);
    replay is a no-op; an injected shifted batch surfaces the moved word."""
    from observation_lakehouse_spark.operators.text import jsd_term_divergence
    from observation_lakehouse_spark.streaming.drift import StreamingTermDriftMonitor

    DSCHEMA = "doc_id long, text string"
    ref_rows = [(i, "alpha beta gamma delta " * 3 + "epsilon zeta") for i in range(20)]
    cur1 = [(100 + i, "alpha beta gamma delta epsilon zeta") for i in range(10)]
    cur2 = [(200 + i, "omega omega omega alpha") for i in range(10)]  # drift: omega
    ref = spark.createDataFrame(ref_rows, DSCHEMA)
    mon = StreamingTermDriftMonitor(
        spark, str(tmp_path / "state"), ref, "text", top_k=5
    )
    # top-5 by (count DESC, term ASC): alpha/beta/delta/gamma dominate,
    # epsilon/zeta tie-break alphabetically -> epsilon kept, zeta folds
    assert mon.terms == ["alpha", "beta", "delta", "epsilon", "gamma"]

    landing = tmp_path / "landing"
    spark.createDataFrame(cur1, DSCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(cur2, DSCHEMA).write.parquet(str(landing / "f2"))
    stream = spark.readStream.schema(DSCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    got = {r.term: tuple(r) for r in mon.report().collect()}
    # state is bounded: frozen terms + __other__ only
    assert set(got) <= set(mon.terms) | {StreamingTermDriftMonitor.OTHER}
    # frozen-term rows match the batch operator bit-for-bit
    cur_df = spark.createDataFrame(cur1 + cur2, DSCHEMA)
    batch = {
        r.term: tuple(r)
        for r in jsd_term_divergence(ref, cur_df, k=100).collect()
        if r.term in set(mon.terms)
    }
    for t in mon.terms:
        assert got[t] == batch[t], (t, got[t], batch.get(t))
    # the injected word drifted the OTHER bucket hardest (omega is unfrozen)
    top_row = mon.report().collect()[0]
    assert top_row.term == StreamingTermDriftMonitor.OTHER
    assert top_row.jsd_contrib_micro > 0

    # exactly-once replay
    v = mon.mv.table.latest_version()
    q = mon.start(
        spark.readStream.schema(DSCHEMA).parquet(str(landing) + "/*"),
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    assert mon.mv.table.latest_version() == v


def test_stream_cell_drift_detects_embedding_shift(spark, tmp_path):
    """r9 StreamingCellDriftMonitor: PSI over frozen IVF cell occupancy.
    A stream matching the reference's cell mix reads ~zero drift; a batch
    concentrated in one direction moves mass into that cell and the PSI
    decomposition points at it. Replay is a no-op."""
    from observation_lakehouse_spark.streaming.drift import StreamingCellDriftMonitor

    ESCHEMA = "vec_id long, embedding array<double>"
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    # reference: balanced across the three cells
    ref_rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
                for i in range(30)]
    ref = spark.createDataFrame(ref_rows, ESCHEMA)
    mon = StreamingCellDriftMonitor(spark, str(tmp_path / "state"), ref, cents)
    assert [n for _, n in mon.ref_bins] == [10, 10, 10]

    landing = tmp_path / "landing"
    balanced = [(100 + i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
                for i in range(30)]
    spark.createDataFrame(balanced, ESCHEMA).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(ESCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert sum(r.psi_contrib_micro for r in mon.report().collect()) < 20_000

    # drifted batch: everything lands in cell 0
    shifted = [(200 + i, [1.0, 0.01, 0.0]) for i in range(60)]
    spark.createDataFrame(shifted, ESCHEMA).write.parquet(str(landing / "f2"))
    q = mon.start(
        spark.readStream.schema(ESCHEMA).parquet(str(landing) + "/*"),
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    rows = {r.cell: r for r in mon.report().collect()}
    assert sum(r.psi_contrib_micro for r in rows.values()) > 250_000
    assert rows[0].psi_contrib_micro == max(r.psi_contrib_micro for r in rows.values())

    # exactly-once replay
    v = mon.mv.table.latest_version()
    q = mon.start(
        spark.readStream.schema(ESCHEMA).parquet(str(landing) + "/*"),
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    assert mon.mv.table.latest_version() == v


# -- StreamingChi2Monitor (r9) --------------------------------------------


CAT_SCHEMA = "event_id long, label string"

CREF = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
CROWS1 = [(i, ["a", "b"][i % 2]) for i in range(200)]
CROWS2 = [(200 + i, "zz") for i in range(40)] + [(300 + i, None) for i in range(5)]


def _chi_batch(spark, rows):
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.operators.audit import chi2_test
    from observation_lakehouse_spark.streaming.drift import StreamingChi2Monitor

    known = ["a", "b", "c"]
    ref = spark.createDataFrame(CREF, CAT_SCHEMA)
    cur = spark.createDataFrame(rows, CAT_SCHEMA).select(
        "event_id",
        F.when(F.col("label").isin(known), F.col("label"))
        .otherwise(
            F.when(F.col("label").isNull(), F.lit(None)).otherwise(
                F.lit(StreamingChi2Monitor.OTHER)
            )
        )
        .alias("label"),
    )
    return [tuple(r) for r in chi2_test(ref, cur, "label").collect()]


def test_stream_chi2_matches_batch_and_replays(spark, tmp_path):
    from observation_lakehouse_spark.streaming.drift import StreamingChi2Monitor

    ref = spark.createDataFrame(CREF, CAT_SCHEMA)
    mon = StreamingChi2Monitor(spark, str(tmp_path / "state"), ref, "label")
    landing = tmp_path / "landing"
    spark.createDataFrame(CROWS1, CAT_SCHEMA).write.parquet(str(landing / "f1"))
    stream = spark.readStream.schema(CAT_SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert [tuple(r) for r in mon.report().collect()] == _chi_batch(spark, CROWS1)

    # replay is a no-op
    v = mon.mv.table.latest_version()
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert mon.mv.table.latest_version() == v

    # unseen category folds to __other__, NULLs drop, report stays batch-exact
    spark.createDataFrame(CROWS2, CAT_SCHEMA).write.parquet(str(landing / "f2"))
    q = mon.start(stream, checkpoint=str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    got = [tuple(r) for r in mon.report().collect()]
    assert got == _chi_batch(spark, CROWS1 + CROWS2)
    cats = [r[0] for r in got]
    assert StreamingChi2Monitor.OTHER in cats and None not in cats
    # the a/b-only + unseen-category mix is loud drift
    assert got[0][6] > 10_000_000  # chi2_micro shared column


def test_stream_chi2_validates_cardinality(spark, tmp_path):
    import pytest as _pytest

    from observation_lakehouse_spark.streaming.drift import StreamingChi2Monitor

    ref = spark.createDataFrame(
        [(i, str(i)) for i in range(50)], CAT_SCHEMA
    )
    with _pytest.raises(ValueError):
        StreamingChi2Monitor(
            spark, str(tmp_path / "s"), ref, "label", max_categories=10
        )
