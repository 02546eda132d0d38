"""Local mirror of the driver's DuckDB-oracle differential check.

Runs every ``queries()`` entry from ``__spark_entry__`` against its
``oracle_sql()`` twin on the same parquet tables and compares row count, column
names, and order-insensitive values. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from observation_lakehouse_spark.operators.dedup import release_cached  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(map(str.lower, spark_pdf.columns)) != sorted(map(str.lower, oracle_pdf.columns)):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    oracle_pdf = oracle_pdf.rename(
        columns={o: s for o in oracle_pdf.columns for s in spark_pdf.columns if o.lower() == s.lower()}
    )
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = canonical(spark_pdf), canonical(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            eq = (pd.isna(av) & pd.isna(bv)) | np.isclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
            )
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {bad} float mismatches, e.g. row{i}: {av[i]!r} vs {bv[i]!r}"
                )
        else:
            av_s = pd.Series(av).map(lambda v: None if pd.isna(v) else str(v))
            bv_s = pd.Series(bv).map(lambda v: None if pd.isna(v) else str(v))
            eq = av_s.fillna("\0NULL") == bv_s.fillna("\0NULL")
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c}: {bad} mismatches, e.g. row{i}: {av_s[i]!r} vs {bv_s[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Bare session ON PURPOSE: the driver's harness builds a default
    # SparkSession with none of session.py's confs, so this mirror must too —
    # any query that only works under our tuned session is a latent driver
    # failure (this is exactly how the round-2 TIMESTAMP(NANOS→MICROS) break
    # slipped through).
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName("correctness-check").master(
        f"local[{cpus}]"
    )
    # Stress knob (NOT set by the driver — the bare-session contract holds):
    # SPARK_GRAFT_DRIVER_MEM=768m runs the sweep with the JVM heap capped
    # BELOW the driver's 1g default, proving every query fits with margin
    # (VERDICT r6 #1's done-criterion).
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            spark_pdf = df.toPandas()
            release_cached(df)
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        t1 = time.perf_counter()
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(spark_pdf)} rows, {t1 - t0:.2f}s)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"✗ {name}: ({len(spark_pdf)} rows, {t1 - t0:.2f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name} ({len(spark_pdf)} rows, {t1 - t0:.2f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
