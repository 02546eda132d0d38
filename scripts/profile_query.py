"""Scratch profiler: time a queries() entry and count Spark jobs/stages.

Usage: python scripts/profile_query.py <name> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from observation_lakehouse_spark.operators.dedup import release_cached  # noqa: E402
from observation_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        entrymod._t(spark, sf_dir, tbl).limit(1).collect()
    jsc = spark.sparkContext._jsc.sc()
    qs = entrymod.queries()
    for i in range(reps):
        n0 = jsc.dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.mode("overwrite").format("noop").save()
        t_total = time.perf_counter() - t0
        n1 = jsc.dagScheduler().nextJobId()
        release_cached(df)
        print(
            f"run{i}: total={t_total:.3f}s build={t_build:.3f}s "
            f"jobs={n1 - n0}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
