"""The events-timestamp contract (__spark_entry__._t / _read_events).

The driver regenerates testdata between rounds and has already switched
events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) once, breaking
every query that computed on ts in the driver's bare session. _read_events
must normalize ANY footer unit to epoch-microsecond bigints — these tests
write the same rows at three physical units and require identical output.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

T0 = dt.datetime(2024, 1, 1, 0, 0, 7, 179575)
T1 = dt.datetime(2024, 1, 30, 23, 57, 12, 194062)
EXPECTED_US = [
    int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in (T0, T1)
]


def _write_events(path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([T0, T1], pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":2}'], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_read_events_normalizes_any_unit_to_micro_longs(spark, tmp_path, unit):
    p = str(tmp_path / "events.parquet")
    _write_events(p, unit)
    df = entrymod._read_events(spark, p)
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    expected = EXPECTED_US
    if unit == "ms":  # millis writing truncates sub-ms digits
        expected = [t // 1000 * 1000 for t in EXPECTED_US]
    assert got == {1: expected[0], 2: expected[1]}
    # the rest of the schema must survive the explicit-schema read
    assert [f for f, _ in df.dtypes] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]


def test_raw_int64_micros_resolved_without_guessing(spark, tmp_path):
    """A drop that stores ts as raw int64 (no timestamp logical type) defeats
    both footer probes; the magnitude classifier must still resolve micros —
    the case where the old fallback silently divided by 1000."""
    p = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(EXPECTED_US, pa.int64()),
            "user_id": pa.array([10, 20], pa.int64()),
        }
    )
    pq.write_table(table, p)
    df = entrymod._read_events(spark, p)
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got == {1: EXPECTED_US[0], 2: EXPECTED_US[1]}


def test_raw_int64_unknown_unit_raises_not_guesses(spark, tmp_path):
    """Unclassifiable raw int64 (zeros — no magnitude signal) must raise, not
    silently pick a unit (ADVICE r03: a wrong divide corrupts every events
    query with no error)."""
    p = str(tmp_path / "events.parquet")
    table = pa.table({"event_id": pa.array([1], pa.int64()),
                      "ts": pa.array([0], pa.int64())})
    pq.write_table(table, p)
    with pytest.raises(RuntimeError, match="refusing to guess"):
        entrymod._read_events(spark, p)


def test_duckdb_footer_probe_agrees_with_pyarrow(tmp_path):
    """The second-opinion probe must read the same unit pyarrow does on a
    normal timestamp column (it is the fallback when pyarrow is broken)."""
    p = str(tmp_path / "events.parquet")
    _write_events(p, "us")
    assert entrymod._ts_unit_via_duckdb(p) == "us"


def test_t_event_queries_run_in_bare_session(spark, tmp_path):
    """Sessionization end-to-end through _t on a fresh micro-unit file — the
    exact path that failed in the round-2 driver run."""
    sf_dir = str(tmp_path)
    _write_events(f"{sf_dir}/events.parquet", "us")
    df = entrymod._t(spark, sf_dir, "events")
    rows = df.select("ts").collect()
    assert all(isinstance(r["ts"], int) for r in rows)
