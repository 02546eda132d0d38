"""Heap gate (r7 judge #5): make the per-query heap telemetry BITE.

Two assertions, exit nonzero on either:

1. **No escaped persists, for EVERY registered query**: run the full
   registry at sf0.001 through scripts/heap_report.py's measurement loop
   (release_cached -> drop the result handle -> bounded GC/cleaner drain)
   and require residual cached-storage bytes == 0 per query. Leaks are
   SF-independent — a persist that escapes its ``_cached_deps`` handle
   escapes at any scale — so the cheap SF keeps the gate ~5 min.
2. **The top-5 heap-heaviest queries at sf0.1 FIT inside 70% of the
   768 MB cap**: run them through one JVM whose heap IS the bound
   (537 MB) and require rc=0 with zero residuals. This is the ground
   truth the bound intends — a G1 Old-Gen *peak meter* under a 768 MB
   heap reads reclaimable garbage (G1 expands into whatever heap exists
   and collects lazily; measured swing ±80 MB with co-tenant load), so a
   ``peak < 70%`` assertion flakes while the live requirement is
   unchanged. A capped green run proves the live + transient set fits
   the bound, GC noise included; the per-query peaks (now bounded by the
   537 MB heap) are still printed as telemetry.

Usage:
    python scripts/heap_gate.py            # both gates
    python scripts/heap_gate.py --leaks    # gate 1 only
    python scripts/heap_gate.py --peaks    # gate 2 only
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
HEAP_REPORT = REPO / "scripts" / "heap_report.py"

# The measured top-5 Old-Gen-heaviest registered queries at sf0.1/768m
# (r8 audit: dup_clusters 508.6 MB, chargram_jaccard 500.6, containment
# ~450, leakage_safe_split 455.8, knn_graph ~415 — solo, clean-baseline).
# Extend when a new query family lands near the top of heap_report output.
TOP5 = [
    "dup_clusters",
    "chargram_jaccard",
    "leakage_safe_split",
    "containment",
    "knn_graph",
]
CAP_MB = 768
PEAK_BOUND_MB = int(0.70 * CAP_MB)  # 537m — the gate-2 JVM heap


def _run_heap_report(sf_dir: str, names: list[str], mem_mb: int = CAP_MB) -> list[dict]:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=f"{mem_mb}m")
    out = subprocess.run(
        [sys.executable, str(HEAP_REPORT), sf_dir, *names],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        raise SystemExit(f"heap_report failed rc={out.returncode}")
    return [
        json.loads(ln)
        for ln in out.stdout.splitlines()
        if ln.startswith('{"query"')
    ]


def gate_leaks() -> int:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    names = list(entry.queries(clear_cache=False).keys())
    print(f"[leaks] auditing {len(names)} registered queries at sf0.001 ...")
    recs = _run_heap_report("/root/testdata/sf0.001", names)
    missing = set(names) - {r["query"] for r in recs}
    leaks = [r for r in recs if r["residual_cache_mb"] > 0]
    for r in leaks:
        print(f"[leaks] LEAK {r['query']}: {r['residual_cache_mb']} MB "
              "cached storage survives release_cached + handle drop")
    if missing:
        print(f"[leaks] MISSING measurements: {sorted(missing)}")
    ok = not leaks and not missing
    print(f"[leaks] {'OK' if ok else 'FAIL'} ({len(recs)} queries, "
          f"{len(leaks)} leaks)")
    return 0 if ok else 1


def gate_peaks() -> int:
    print(f"[peaks] running top-5 heaviest at sf0.1 with the JVM heap = "
          f"{PEAK_BOUND_MB}m (70% of the {CAP_MB}m cap) ...")
    try:
        recs = _run_heap_report("/root/testdata/sf0.1", TOP5, PEAK_BOUND_MB)
    except SystemExit:
        print(f"[peaks] FAIL: a top-5 query cannot run inside {PEAK_BOUND_MB}m")
        return 1
    rc = 0
    got = {r["query"]: r for r in recs}
    for name in TOP5:
        rec = got.get(name)
        if rec is None:
            print(f"[peaks] FAIL {name}: no measurement (died mid-run?)")
            rc = 1
            continue
        if rec["residual_cache_mb"] > 0:
            print(f"[peaks] LEAK {name}: {rec['residual_cache_mb']} MB")
            rc = 1
            continue
        print(f"[peaks] OK {name}: ran green inside {PEAK_BOUND_MB}m "
              f"(old_gen_peak {rec['old_gen_peak_mb']} MB, "
              f"live_after_gc {rec['live_after_gc_mb']} MB)")
    return rc


def main() -> int:
    flags = set(sys.argv[1:])
    rc = 0
    if not flags or "--leaks" in flags:
        rc |= gate_leaks()
    if not flags or "--peaks" in flags:
        rc |= gate_peaks()
    print(f"heap gate: {'PASS' if rc == 0 else 'FAIL'}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
