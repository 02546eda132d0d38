"""Round-13 measurement harness: job counts + min-of-N walls + plan dumps.

For each named queries() entry: N reps (wall via the noop sink, Spark job
count via dagScheduler nextJobId deltas — the load-proof metric), with the
trivial-job canary measured between query groups so every window is
load-stamped. Optionally dumps `.explain('formatted')` of the returned frame
with the build job count in the header (the plans/rNN artifact format).

    python scripts/measure_queries.py [--sf sf_dir] [--reps N] \
        [--dump plans/r13 --tag before] name [name ...]

Emits one JSON line per query: {"q": name, "walls": [...], "jobs": [...],
"canary_ms": p50} and a final {"all": total_sec}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from observation_lakehouse_spark.operators.dedup import release_cached  # noqa: E402
from observation_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dump", default=None, help="directory for plan dumps")
    ap.add_argument("--tag", default="now", help="plan dump filename suffix")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import bench

    spark = get_spark("measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        entrymod._t(spark, args.sf, tbl).limit(1).collect()
    jsc = spark.sparkContext._jsc.sc()
    qs = entrymod.queries()
    t_all = time.perf_counter()
    for name in args.names:
        canary = bench.trivial_job_p50_ms(spark)
        walls, jobs = [], []
        plan = None
        for i in range(args.reps):
            n0 = jsc.dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.dump and i == 0:
                from observation_lakehouse_spark.plans.inspect import explain_str

                n_build = jsc.dagScheduler().nextJobId() - n0
                plan = (
                    f"# {name} — .explain('formatted') of the returned "
                    f"DataFrame ({args.tag})\n"
                    "# Spark jobs executed while BUILDING the query "
                    "(commit-shaped and\n# loop-shaped operators run their "
                    "work eagerly here; the final frame\n# below may "
                    f"therefore be a small literal/serving scan): {n_build}\n\n"
                    + explain_str(df)
                )
            df.write.mode("overwrite").format("noop").save()
            walls.append(round(time.perf_counter() - t0, 3))
            jobs.append(jsc.dagScheduler().nextJobId() - n0)
            release_cached(df)
        if args.dump and plan is not None:
            outdir = Path(args.dump)
            outdir.mkdir(parents=True, exist_ok=True)
            (outdir / f"{name}_{args.tag}.txt").write_text(plan)
        print(
            json.dumps(
                {
                    "q": name,
                    "walls": walls,
                    "min": min(walls),
                    "jobs": jobs,
                    "canary_ms": round(canary, 1),
                }
            ),
            flush=True,
        )
    print(json.dumps({"all": round(time.perf_counter() - t_all, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
