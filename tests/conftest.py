"""Shared Spark session + domain fixtures (FIXTURES.md §A)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession

from observation_lakehouse_spark.schemas import (
    ARENA_EXPORT_SCHEMA,
    CODE_IMPLEMENTATIONS_SCHEMA,
    OBSERVATIONS_SCHEMA,
    TESTS_SCHEMA,
)

FIXED_TS = dt.datetime(2026, 1, 1, 0, 0, 0)

# Planted behavior classes per problem: impl index → class (sizes 6/3/1,
# FIXTURES.md A1 "Planted structure").
BEHAVIOR_CLASS = {0: "a", 1: "a", 2: "a", 3: "a", 4: "a", 5: "a", 6: "b", 7: "b", 8: "b", 9: "c"}
N_PROBLEMS, N_IMPLS, N_TESTS, N_STEPS = 4, 10, 8, 5


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = (
        SparkSession.builder.master("local[4]")
        .appName("olake-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", str(wh))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _output_for(problem: int, impl: int, test: int, step: int) -> str:
    """Deterministic output: identical within a behavior class; the singleton
    class ('c') differs on exactly one step via an exception marker."""
    cls = BEHAVIOR_CLASS[impl]
    if cls == "c" and test == 0 and step == 2:
        return "$EXCEPTION@java.lang.ArithmeticException"
    base = "a" if cls in ("a", "c") else "b"  # class c == class a except one step
    return f"out_{base}_{problem}_{test}_{step}"


def observation_rows() -> list[tuple]:
    rows = []
    for p in range(N_PROBLEMS):
        for i in range(N_IMPLS):
            for t in range(N_TESTS):
                for s in range(N_STEPS):
                    rows.append(
                        (
                            "DSA",
                            f"p_{p:03d}",
                            f"impl_{i:02d}_original_0",
                            f"t_{t:02d}()",
                            "",
                            "",
                            "run-0001",
                            "env-0001",
                            s,
                            "public static long P.sum(java.util.List)",
                            '"[1,2]","3"',
                            _output_for(p, i, t, s),
                            float(1 + (i * 7 + t * 3 + s) % 50),
                            None,
                            None,
                            FIXED_TS,
                            None,
                            None,
                            None,
                            False,
                        )
                    )
    return rows


@pytest.fixture(scope="session")
def observations(spark):
    return spark.createDataFrame(observation_rows(), OBSERVATIONS_SCHEMA)


@pytest.fixture(scope="session")
def code_implementations(spark):
    rows = []
    for p in range(N_PROBLEMS):
        for i in range(N_IMPLS):
            src = f"class P{p}_{i} {{\n  long sum(java.util.List xs) {{ return {i}; }}\n}}\n"
            rows.append(
                (
                    "DSA",
                    f"p_{p:03d}",
                    f"impl_{i:02d}_original_0",
                    src,
                    None,
                    FIXED_TS,
                    3,
                    1 + i % 5,
                    "java",
                )
            )
    return spark.createDataFrame(rows, CODE_IMPLEMENTATIONS_SCHEMA)


@pytest.fixture(scope="session")
def tests_table(spark):
    rows = []
    for p in range(N_PROBLEMS):
        for t in range(N_TESTS):
            rows.append(
                (
                    "DSA",
                    f"p_{p:03d}",
                    f"t_{t:02d}()",
                    '{"cells":{"A1":{},"B1":"create","C1":"Problem"}}',
                    "Problem { sum(java.util.List)->long }",
                    None,
                    FIXED_TS,
                    "java",
                )
            )
    return spark.createDataFrame(rows, TESTS_SCHEMA)


def arena_cell_rows() -> list[tuple]:
    """Raw arena export (FIXTURES.md A4): per (impl, test, step) one op cell,
    two input_value cells with DESCENDING physical order but ascending X (the
    ordered-agg check), one value cell; plus oracle rows (must be filtered),
    Y=-1 metadata rows, and one sheet with no stimulussheet."""
    rows = []
    exec_id, arena_id = "exec-1", "arena-1"
    for p in ("p_000", "p_001"):
        for sheet in ("t_00()", "t_01()"):
            # metadata rows; t_01() of p_001 has NO stimulussheet → dropped in tests reshape
            if not (p == "p_001" and sheet == "t_01()"):
                rows.append((exec_id, p, "abstraction", "", "0", sheet, arena_id, 0, -1,
                             "stimulussheet", f"sheet-src-{p}-{sheet}", None))
            rows.append((exec_id, p, "abstraction", "", "0", sheet, arena_id, 1, -1,
                         "interface", f"iface-{p}", None))
            for system in ("sysA", "sysB", "oracle"):
                variant = "" if system == "sysA" else "original"
                for step in range(2):
                    # input_value cells appended X=1 then X=0: physical order reversed
                    rows.append((exec_id, p, system, variant, "0", sheet, arena_id, 1, step,
                                 "input_value", f"in_{step}_x1", 0.5))
                    rows.append((exec_id, p, system, variant, "0", sheet, arena_id, 0, step,
                                 "input_value", f"in_{step}_x0", 0.5))
                    rows.append((exec_id, p, system, variant, "0", sheet, arena_id, 2, step,
                                 "op", f"op_{step}", 1.0))
                    rows.append((exec_id, p, system, variant, "0", sheet, arena_id, 3, step,
                                 "value", f"val_{system}_{step}", 2.5))
    return rows


@pytest.fixture(scope="session")
def arena_cells(spark):
    return spark.createDataFrame(arena_cell_rows(), ARENA_EXPORT_SCHEMA)
