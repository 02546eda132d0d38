"""Plan inspection helpers — the feedback loop for the 100 TB design rules.

Used by tests to assert the plans we *want*, not just results: filters pushed to
the Parquet scan, pruned column sets, broadcast joins where dims are small.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string (Spark only prints it)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the PushedFilters of the formatted plan."""
    plan = explain_str(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, count: int = 1) -> None:
    """Assert the plan contains at least ``count`` broadcast hash joins."""
    plan = explain_str(df)
    found = plan.count("BroadcastHashJoin")
    assert found >= count, f"expected ≥{count} BroadcastHashJoin, got {found}; plan:\n{plan}"
