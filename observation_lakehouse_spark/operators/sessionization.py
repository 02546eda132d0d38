"""Batch sessionization: gap-based sessions via aligned window passes.

The reference has no streaming/session operators (SURVEY.md §2.9 ABSENT —
"continual" ingestion is repeated batch appends, reference arena.py:146); this
is the extension analytics path. The streaming twin with identical semantics
is :func:`observation_lakehouse_spark.streaming.stateful.sessionize`.

Scale notes (100 TB): exactly ONE shuffle, on the session key. The ``lag``
gap-flag window and the running-sum session-number window share the same
(partitionBy, orderBy), so Catalyst fuses them into a single Window operator
over one sort; the final groupBy on (key, session_no) reuses the window's hash
partitioning (a subset of the grouping keys satisfies ClusteredDistribution),
so no second exchange. Per-key state never materializes beyond the sort spill
path, so skewed users degrade to disk, not OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    gap: int,
    ts_col: str = "ts_us",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """events(key, ts[long], tiebreak, value?) → one row per (key, session).

    A session is a maximal run of a key's events where consecutive gaps are
    <= ``gap`` (same units as ``ts_col``). Output: key, session_no (0-based,
    in time order), session_start/session_end (min/max ts), n_events, and —
    when ``value_col`` is given — session_value as an exact DECIMAL sum
    surfaced as double (cross-engine reproducible).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    new_sess = (
        F.when(F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(gap), 1)
        .otherwise(0)  # first row per key: NULL lag → otherwise-branch → 0
        .alias("_new_sess")
    )
    cols = [key_col, ts_col, tiebreak_col] + ([value_col] if value_col else [])
    numbered = events.select(*cols, new_sess)
    numbered = numbered.withColumn(
        "session_no", F.sum("_new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("session_value")
        )
    return numbered.groupBy(key_col, "session_no").agg(*aggs)
