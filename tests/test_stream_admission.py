"""Streaming admission pipeline (streaming/admission.py, r9): one document
stream through the composed gates — batch-level PSI drift quarantine,
row-level quality floor, standing-corpus near-dup admission, token budget —
with exactly-once appends and a per-batch admission log."""

from __future__ import annotations

from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.streaming.admission import (
    _LOG_SCHEMA,
    StreamingAdmissionPipeline,
)
from observation_lakehouse_spark.transaction import AtomicParquetTable

SCHEMA = "doc_id long, text string"

# reference corpus: medium-length, wordy, good quality
_REF_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank " * 2,
    "spark executes declarative plans through catalyst and tungsten stages " * 2,
    "columnar storage formats enable efficient predicate pushdown and pruning " * 2,
    "distributed aggregation relies on map side combining before the shuffle " * 2,
    "window functions order rows within partitions for analytic computations " * 2,
    "broadcast joins replicate the small side to every executor in the cluster " * 2,
]


def _mk(spark, tmp_path, **kw):
    ref = spark.createDataFrame(list(enumerate(_REF_TEXTS)), SCHEMA)
    admitted = AtomicParquetTable(
        spark, str(tmp_path / "admitted"), schema=_parse_datatype_string(SCHEMA)
    )
    quarantine = AtomicParquetTable(
        spark, str(tmp_path / "quarantine"), schema=_parse_datatype_string(SCHEMA)
    )
    log = AtomicParquetTable(
        spark, str(tmp_path / "log"), schema=_parse_datatype_string(_LOG_SCHEMA)
    )
    pipe = StreamingAdmissionPipeline(
        spark,
        admitted,
        quarantine,
        log,
        corpus=ref,
        ref=ref,
        min_quality=0.5,
        psi_gate_micro=250_000,
        num_hashes=64,
        bands=16,
        **kw,
    )
    return pipe, admitted, quarantine, log


def _run(spark, pipe, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = pipe.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(240)


def test_drifted_batch_quarantined_clean_batches_commit(spark, tmp_path):
    pipe, admitted, quarantine, log = _mk(spark, tmp_path)
    landing = tmp_path / "landing"

    # batch 1: clean — reference-like lengths, novel wordy content
    clean = [
        (100, "gradient descent updates parameters along the loss surface "
              "while momentum smooths the trajectory across noisy batches " * 2),
        (101, "tokenizers split raw text into subword units that balance "
              "vocabulary size against sequence length for the model " * 2),
    ]
    spark.createDataFrame(clean, SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    assert sorted(r.doc_id for r in admitted.read().collect()) == [100, 101]
    assert quarantine.read().count() == 0

    # batch 2: DRIFTED — every doc is a tiny fragment, the length
    # distribution collapses into bin 0 -> PSI blows past the gate and the
    # WHOLE batch lands in quarantine (even rows that look fine alone)
    drifted = [(200 + i, f"tiny {i}") for i in range(12)]
    spark.createDataFrame(drifted, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    assert sorted(r.doc_id for r in admitted.read().collect()) == [100, 101]
    assert quarantine.read().count() == 12
    logs = {r.batch_id: r for r in log.read().collect()}
    drift_rows = [r for r in logs.values() if r.quarantined]
    assert len(drift_rows) == 1
    assert drift_rows[0].quarantine_reason == "psi_drift"
    assert drift_rows[0].psi_micro > 250_000

    # batch 3: clean again — a novel doc admits, a near-dup of an
    # ALREADY-ADMITTED doc rejects (read-your-writes), a junk doc fails
    # the quality floor
    batch3 = [
        (300, "checkpoint barriers flow through the dataflow graph so the "
              "operators snapshot consistent state without pausing " * 2),
        (301, clean[0][1] + " tiny suffix"),  # near-dup of admitted 100
        (302, "0000 1111 !!!! ####" * 10),    # low quality: non-alpha junk
    ]
    spark.createDataFrame(batch3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    assert sorted(r.doc_id for r in admitted.read().collect()) == [100, 101, 300]
    b3 = max(r.batch_id for r in log.read().collect())
    row3 = {r.batch_id: r for r in log.read().collect()}[b3]
    assert not row3.quarantined
    assert row3.n_admitted == 1
    assert row3.n_quality_rejected >= 1
    assert row3.n_dup_rejected >= 1

    # replay over the same checkpoint: no table moves (exactly-once)
    va, vq, vl = (t.latest_version() for t in (admitted, quarantine, log))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    assert (admitted.latest_version(), quarantine.latest_version(),
            log.latest_version()) == (va, vq, vl)


def test_token_budget_quarantines_overflow(spark, tmp_path):
    pipe, admitted, quarantine, log = _mk(spark, tmp_path, token_budget=25)
    landing = tmp_path / "landing"
    doc = ("approximate nearest neighbor indexes trade recall for sublinear "
           "query cost across very large embedding collections " * 2)
    spark.createDataFrame([(100, doc)], SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    assert admitted.read().count() == 1
    assert pipe.tokens_admitted() >= 25  # budget now exhausted

    spark.createDataFrame(
        [(101, "fresh novel content about entirely different systems topics "
               "covering storage engines and write ahead logging design " * 2)],
        SCHEMA,
    ).write.parquet(str(landing / "f2"))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    assert admitted.read().count() == 1  # nothing more admitted
    assert quarantine.read().count() == 1
    reasons = {r.quarantine_reason for r in log.read().collect() if r.quarantined}
    assert reasons == {"token_budget"}


def test_trained_classifier_gate(spark, tmp_path):
    """r11: an optional frozen trained classifier joins the row gates —
    docs the trained model scores below the floor are rejected next to
    the heuristic floor, and the weight table is frozen at construction
    (no per-batch training)."""
    from observation_lakehouse_spark.operators.classifier import (
        hashed_token_features,
        logreg_train,
        quality_labels,
    )

    # train on a corpus where long docs are the positive class
    train = spark.createDataFrame(
        [(i, ("informative words flow through spark pipelines cleanly " * 6)
          if i % 2 == 0 else "short junk")
         for i in range(40)],
        SCHEMA,
    )
    w = logreg_train(
        hashed_token_features(train), quality_labels(train, min_tokens=20),
        n_rounds=6,
    )
    pipe, admitted, quarantine, log = _mk(
        spark, tmp_path,
        classifier_weights=w,
        min_classifier_micro=500_001,
        min_batch_for_drift=10**9,       # disable the drift gate
    )
    pipe.min_quality = 0.0               # isolate the trained gate
    landing = tmp_path / "landing"
    # doc 100 carries the positive-class vocabulary (hashed features only
    # score buckets the model SAW — a fully-novel vocabulary scores the
    # intercept prior) and is not in the standing corpus (the training
    # corpus never entered it), so only the trained gate decides; doc 101
    # is short junk the model rejects
    batch = [
        (100, "informative words flow through spark pipelines cleanly " * 6),
        (101, "tiny junk doc"),
    ]
    spark.createDataFrame(batch, SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, pipe, landing, tmp_path / "ckpt")
    admitted_ids = {r["doc_id"] for r in admitted.read().collect()}
    assert 100 in admitted_ids and 101 not in admitted_ids
    lg = log.read().collect()[0]
    assert lg["n_quality_rejected"] == 1 and lg["n_admitted"] == 1
