"""CDC log compaction + MERGE-style upsert (operators/cdc.py)."""

from __future__ import annotations

from observation_lakehouse_spark.operators.cdc import apply_changes, latest_per_key


def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, seq long, v string")


def test_latest_per_key_picks_newest(spark):
    log = _log(spark, [(1, 1, "old"), (1, 2, "new"), (2, 5, "only")])
    got = {r["k"]: (r["seq"], r["v"]) for r in latest_per_key(log, ["k"], ["seq"]).collect()}
    assert got == {1: (2, "new"), 2: (5, "only")}


def test_latest_per_key_tie_break_is_total(spark):
    # same seq: the later order_by column decides deterministically
    log = spark.createDataFrame(
        [(1, 1, 10, "a"), (1, 1, 20, "b")], "k long, seq long, sub long, v string"
    )
    got = latest_per_key(log, ["k"], ["seq", "sub"]).collect()
    assert len(got) == 1 and got[0]["v"] == "b"


def test_apply_changes_upsert_delete_insert_passthrough(spark):
    base = spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")], "k long, v string")
    changes = spark.createDataFrame(
        [
            (1, "ONE", 1, False),   # upsert existing
            (3, "x", 1, True),      # delete existing
            (4, "four", 1, False),  # insert new key
        ],
        "k long, v string, seq long, deleted boolean",
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changes(base, changes, ["k"], ["seq"], delete_col="deleted").collect()
    }
    assert got == {1: "ONE", 2: "two", 4: "four"}


def test_apply_changes_compacts_batch_first(spark):
    # several versions of one key in a single batch: only the newest applies,
    # including a delete later resurrected by a newer upsert
    base = spark.createDataFrame([(1, "one")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "stale", 1, False), (1, "gone", 2, True), (1, "back", 3, False)],
        "k long, v string, seq long, deleted boolean",
    )
    got = apply_changes(base, changes, ["k"], ["seq"], delete_col="deleted").collect()
    assert len(got) == 1 and got[0]["v"] == "back"


def test_apply_changes_without_deletes(spark):
    base = spark.createDataFrame([(1, "one")], "k long, v string")
    changes = spark.createDataFrame([(2, "two", 1)], "k long, v string, seq long")
    got = {
        r["k"]: r["v"] for r in apply_changes(base, changes, ["k"], ["seq"]).collect()
    }
    assert got == {1: "one", 2: "two"}


def test_latest_per_key_preserves_user_rn_column(spark):
    """A user `_rn` column must survive compaction (ADVICE r03)."""
    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 200), ("b", 1, 300)], "k string, seq long, _rn long"
    )
    got = latest_per_key(df, ["k"], ["seq"]).orderBy("k")
    assert "_rn" in got.columns
    assert [(r["k"], r["seq"], r["_rn"]) for r in got.collect()] == [
        ("a", 2, 200), ("b", 1, 300),
    ]


def test_table_diff_labels_all_change_types(spark):
    from observation_lakehouse_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    # 1 deleted, 3 updated, 5 inserted; 2 and 4 (incl. NULL-equal column) unchanged
    assert out == {1: "deleted", 3: "updated", 5: "inserted"}


def test_table_diff_schema_mismatch_raises(spark):
    import pytest

    from observation_lakehouse_spark.operators.cdc import table_diff

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="share one schema"):
        table_diff(old, new, ["k"])


def test_scd2_build_intervals_collapse_and_tie_rules(spark):
    """SCD2 contract: half-open intervals chain per key, no-op updates
    collapse, same-ts duplicates resolve to one row, newest row open-ended."""
    from observation_lakehouse_spark.operators.cdc import scd2_build

    rows = [
        # key 1: A -> A (no-op, collapses) -> B -> A
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
        # key 2: same-ts duplicate states -> one deterministic winner
        (2, 10, "X"), (2, 10, "Y"), (2, 50, "X"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, state string")
    got = [
        (r.k, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_build(df, ["k"], "ts", ["state"]).collect()
    ]
    import hashlib

    # deterministic tie winner at (2, 10): the higher sha256 digest.
    # If X wins the tie, the ts=50 X row is a NO-OP update and collapses
    # into one open interval; if Y wins, the 50 row is a real change.
    win = max("X", "Y", key=lambda s: hashlib.sha256(s.encode()).hexdigest())
    top = 9_223_372_036_854_775_807
    key2 = (
        [(2, "X", 10, top, True)]
        if win == "X"
        else [(2, "Y", 10, 50, False), (2, "X", 50, top, True)]
    )
    assert got == [
        (1, "A", 10, 30, False),
        (1, "B", 30, 40, False),
        (1, "A", 40, top, True),
        *key2,
    ]
