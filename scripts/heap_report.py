"""Per-query peak-heap report for the bare-session correctness sweep.

VERDICT r6 #1's done-criterion: either the full sf0.1 sweep passes with the
JVM heap capped below 1 g, or a measured peak-heap report shows every graph
query under 70% of 1 g. This measures the latter (for ANY query subset) and
doubles as a leak detector: after each query it also prints the RESIDUAL
cached-storage bytes — anything nonzero after ``release_cached`` is a persist
that escaped a ``_cached_deps`` handle.

Peak measurement: JVM MemoryPool MXBeans (reset before, read after each
query) — the true high-water mark including execution/shuffle buffers, not a
point sample. Usage:

    SPARK_GRAFT_DRIVER_MEM=1g python scripts/heap_report.py \
        /root/testdata/sf0.1 pagerank label_propagation k_core ...

Prints one JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from observation_lakehouse_spark.operators.dedup import release_cached  # noqa: E402

GRAPH_QUERIES = [
    "pagerank",
    "label_propagation",
    "k_core",
    "triangle_count",
    "link_prediction",
    "dup_clusters",
    "canonical_docs",
    "leakage_safe_split",
    "knn_graph",
]


def _pools(jvm):
    beans = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
    return [
        b
        for b in (beans.get(i) for i in range(beans.size()))
        if b.getType().toString() == "Heap memory"
    ]


def main() -> int:
    import os

    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or GRAPH_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName("heap-report").master(f"local[{cpus}]")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    pools = _pools(jvm)
    max_heap = jvm.java.lang.Runtime.getRuntime().maxMemory()

    membean = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    old_gen = [p for p in pools if "Old Gen" in p.getName()]

    qs = entrymod.queries()
    worst_old = 0
    for name in names:
        import gc as _gc
        import time as _time

        fn = qs[name]
        # Clean baseline BEFORE resetting the peak: the previous query's
        # uncollected promotion would otherwise ride inside this query's
        # Old-Gen peak (G1 reclaims Old lazily; a peak read against a dirty
        # baseline overstates the query by whatever garbage preceded it).
        _gc.collect()
        jvm.java.lang.System.gc()
        for p in pools:
            p.resetPeakUsage()
        df = fn(spark, sf_dir)
        n = len(df.toPandas())
        release_cached(df)
        # Old-Gen pool peak: the long-lived-pressure high-water mark (Eden
        # churn is reclaimable by design; "Java heap space" OOMs fire when
        # the LIVE set — which promotes to Old — can't fit after full GC).
        old_peak = sum(p.getPeakUsage().getUsed() for p in old_gen)
        # live residue: used heap right after an explicit full GC
        jvm.java.lang.System.gc()
        live = membean.getHeapMemoryUsage().getUsed()

        # residual cached storage AFTER release — a leak detector. The
        # result handle itself pins localCheckpoint blocks (iterative
        # operators truncate lineage per round; those RDDs live until the
        # plan object is collectable), so drop it first, then give the
        # async ContextCleaner a bounded window to drain — what remains is
        # a genuine escaped persist, not in-flight cleanup.
        def _resid() -> int:
            return sum(
                info.memSize()
                for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()  # noqa: SLF001
            )

        del df
        _gc.collect()
        jvm.java.lang.System.gc()
        resid = _resid()
        deadline = _time.monotonic() + 8.0
        while resid > 0 and _time.monotonic() < deadline:
            _time.sleep(0.3)
            # the cleaner drains a weak-ref queue: each GC cycle can free
            # objects whose referents the previous cycle's cleanup released
            _gc.collect()
            jvm.java.lang.System.gc()
            resid = _resid()
        rec = {
            "query": name,
            "rows": n,
            "old_gen_peak_mb": round(old_peak / 1048576, 1),
            "live_after_gc_mb": round(live / 1048576, 1),
            "residual_cache_mb": round(resid / 1048576, 2),
        }
        worst_old = max(worst_old, old_peak)
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "max_heap_mb": round(max_heap / 1048576),
                "worst_old_gen_peak_mb": round(worst_old / 1048576, 1),
                "worst_old_gen_pct_of_1g": round(100 * worst_old / 1024**3, 1),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
