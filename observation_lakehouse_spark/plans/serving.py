"""Interactive serving: memoized per-query plans (prepared-statement analog).

The reference's per-problem loop re-binds a DuckDB prepared statement, paying
parse/plan once. Spark has no bind parameters in the DataFrame API, and a
freshly-built per-problem DataFrame pays full Catalyst analysis + optimization
+ physical planning on every call — measured ~40–90 ms of a ~200 ms
interactive p50 (scripts/bench_domain.py floor diagnostics). A DataFrame
OBJECT, however, caches its QueryExecution after the first action, so
re-executing the SAME object skips planning entirely.

:class:`QueryCache` memoizes the built DataFrame per (family, parameters):
the first call per problem plans as usual; every repeat executes the frozen
physical plan — measured ~2× lower p50 on the SRM family. This is the right
shape for the reference's real workload (researchers re-query the problems
they are looking at); first-hit latency is bounded below by Spark's planner +
scheduler floor, and corpus-wide serving belongs to the batch job (one
partitioned pass over every problem, see bench_domain's batch metrics).

Correctness note: a frozen plan pins the FILES it scans (the file index is
resolved at planning). After appending to a served table, call
:meth:`QueryCache.invalidate` (ObservationLakehouse.append already refreshes
its own table reads the same way).
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame


class QueryCache:
    """LRU memo of built DataFrames keyed by (family, params).

    ``maxsize`` bounds driver memory: each entry holds an analyzed plan
    (kilobytes), not data — 1024 plans is a few MB.
    """

    def __init__(self, maxsize: int = 1024) -> None:
        if maxsize < 1:
            raise ValueError(f"maxsize must be >= 1, got {maxsize}")
        self.maxsize = maxsize
        self._plans: OrderedDict[tuple, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(
        self,
        family: str,
        params: Hashable,
        builder: Callable[[], DataFrame],
    ) -> DataFrame:
        """Return the memoized DataFrame for (family, params), building on miss."""
        key = (family, params)
        df = self._plans.get(key)
        if df is not None:
            self.hits += 1
            self._plans.move_to_end(key)
            return df
        self.misses += 1
        df = builder()
        self._plans[key] = df
        if len(self._plans) > self.maxsize:
            self._plans.popitem(last=False)
        return df

    def invalidate(self, family: str | None = None) -> None:
        """Drop memoized plans (all, or one family's) after underlying data
        changes — a frozen plan pins the file list it scans."""
        if family is None:
            self._plans.clear()
            return
        for key in [k for k in self._plans if k[0] == family]:
            del self._plans[key]
