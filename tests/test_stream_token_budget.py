"""Streaming token-budget monitor (streaming/token_budget.py): per-bin state
must equal the batch twin over the same delivered rows, survive checkpoint
replay without double-counting, absorb late files, and the cutoff must agree
with the batch operator's boundary-bin arithmetic on the folded corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from observation_lakehouse_spark.streaming.token_budget import (
    StreamingTokenBudgetMonitor,
    bin_token_mass,
)

SCHEMA = "doc_id long, quality_micro long, n_tokens long"
BINS, QMAX = 100, 10_000_000
SPAN = QMAX // BINS

# deterministic, uneven token masses across the quality range
ROWS1 = [(i, (i * 37 % 100) * SPAN + (i % SPAN), 10 + (i * 13) % 90) for i in range(300)]
ROWS2 = [(1000 + i, (i * 11 % 100) * SPAN, 5 + (i * 7) % 40) for i in range(200)]
ROWS3 = [(2000 + i, 99 * SPAN + 1, 1000) for i in range(5)]  # late, top-bin heavy


def _run(spark, mon, landing, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing) + "/*")
    q = mon.start(stream, checkpoint=str(ckpt), available_now=True)
    q.awaitTermination(120)


def _batch_bins(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r._bin: (r.mass, r.docs)
        for r in bin_token_mass(df, n_bins=BINS, quality_micro_max=QMAX).collect()
    }


def _expected_cutoff(rows, num, den):
    mass = {}
    for _, q, t in rows:
        mass[q // SPAN] = mass.get(q // SPAN, 0) + t
    total = sum(mass.values())
    budget = num * total // den
    cum = 0
    for b in sorted(mass, reverse=True):
        cum += mass[b]
        if cum > budget:
            return b, budget - (cum - mass[b]), budget, total
    return None, None, budget, total


def test_stream_bins_match_batch_replay_safe_and_cutoff_agrees(spark, tmp_path):
    mon = StreamingTokenBudgetMonitor(
        spark, str(tmp_path / "state"), n_bins=BINS, quality_micro_max=QMAX
    )
    landing = tmp_path / "landing"
    spark.createDataFrame(ROWS1, SCHEMA).write.parquet(str(landing / "f1"))
    spark.createDataFrame(ROWS2, SCHEMA).write.parquet(str(landing / "f2"))
    _run(spark, mon, landing, tmp_path / "ckpt")

    got = {r._bin: (r.mass, r.docs) for r in mon.bins().collect()}
    assert got == _batch_bins(spark, ROWS1 + ROWS2)

    # exactly-once: a restart over the same checkpoint must not re-fold
    v = mon.mv.table.latest_version()
    _run(spark, mon, landing, tmp_path / "ckpt")
    assert mon.mv.table.latest_version() == v

    # late file folds in incrementally
    spark.createDataFrame(ROWS3, SCHEMA).write.parquet(str(landing / "f3"))
    _run(spark, mon, landing, tmp_path / "ckpt")
    got3 = {r._bin: (r.mass, r.docs) for r in mon.bins().collect()}
    assert got3 == _batch_bins(spark, ROWS1 + ROWS2 + ROWS3)

    # cutoff == the batch operator's phase-1 boundary arithmetic
    cut = mon.cutoff(budget_num=3, budget_den=5).collect()
    assert len(cut) == 1
    exp_bin, exp_rem, exp_budget, exp_total = _expected_cutoff(
        ROWS1 + ROWS2 + ROWS3, 3, 5
    )
    r = cut[0]
    assert (r.cut_bin, r.remaining_tokens) == (exp_bin, exp_rem)
    assert (r.budget_tokens, r.total_tokens) == (exp_budget, exp_total)
    assert r.cut_quality_micro == exp_bin * SPAN

    # the boundary agrees with token_budget_select run on the same corpus:
    # every kept doc is in a bin >= cut_bin, every doc in a bin > cut_bin
    # is kept (the scan-level-keep region)
    from observation_lakehouse_spark.operators.selection import token_budget_select

    df = spark.createDataFrame(ROWS1 + ROWS2 + ROWS3, SCHEMA)
    kept = token_budget_select(
        df, budget_num=3, budget_den=5, n_bins=BINS, quality_micro_max=QMAX
    ).collect()
    kept_bins = {k.quality_micro // SPAN for k in kept}
    assert all(b >= exp_bin for b in kept_bins)
    all_bins = {q // SPAN for _, q, _ in ROWS1 + ROWS2 + ROWS3}
    kept_ids = {k.doc_id for k in kept}
    above = {i for i, q, _ in ROWS1 + ROWS2 + ROWS3 if q // SPAN > exp_bin}
    assert above <= kept_ids
    assert all_bins - kept_bins  # something was actually cut

    # state stays bounded
    assert mon.bins().count() <= BINS


def test_cutoff_everything_fits_is_null_boundary(spark, tmp_path):
    mon = StreamingTokenBudgetMonitor(
        spark, str(tmp_path / "state2"), n_bins=BINS, quality_micro_max=QMAX
    )
    landing = tmp_path / "landing2"
    spark.createDataFrame(ROWS1[:10], SCHEMA).write.parquet(str(landing / "f1"))
    _run(spark, mon, landing, tmp_path / "ckpt2")
    # budget 5/5 = total -> nothing exceeds, NULL boundary with totals
    r = mon.cutoff(budget_num=5, budget_den=5).collect()
    assert len(r) == 1 and r[0].cut_bin is None
    assert r[0].total_tokens == sum(t for _, _, t in ROWS1[:10])
    assert r[0].budget_tokens == r[0].total_tokens
