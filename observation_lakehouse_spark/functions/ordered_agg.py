"""Ordered aggregation idioms (SURVEY.md §2.4 A2/A7/A8, §7.3.1).

DuckDB allows ``ORDER BY`` inside any aggregate (``STRING_AGG(x, ',' ORDER BY k)``,
``list(x ORDER BY k)``, reference arena.py:83-90, benchmark_behavioral_clustering.py:57-74).
Spark's hash aggregate has no intra-group ordering, so the idiomatic translation is
the struct-sort idiom, fully JVM-side (whole-stage codegen, no UDF):

    collect_list(struct(key, value))  →  array_sort  →  transform(s -> s.value)

``array_sort`` on structs compares fields left-to-right = ORDER BY key [, value].
``collect_list`` drops NULL *structs* but keeps structs with NULL fields, so a
CASE-filtered aggregand (A2) must put the ``when(...)`` INSIDE the struct-building
expression as a pre-filter, not rely on collect_list.

NULL semantics matched to DuckDB:
- ``STRING_AGG`` skips NULL values and returns NULL (not '') when every value in
  the group is NULL → we filter NULLs before collecting and wrap the join in
  ``when(size > 0, ...)``.
- ``list(x ORDER BY k)`` KEEPS nulls (they sort last in DuckDB's default
  NULLS LAST for ASC)  → ``ordered_values`` keeps them and sorts null keys/values
  last to match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sorted_structs(order_by: str | Column, value: str | Column) -> Column:
    """collect_list(struct(k, v)) sorted by (k, v) — the shared core."""
    k = F.col(order_by) if isinstance(order_by, str) else order_by
    v = F.col(value) if isinstance(value, str) else value
    return F.array_sort(F.collect_list(F.struct(k.alias("k"), v.alias("v"))))


def ordered_values(order_by: str | Column, value: str | Column) -> Column:
    """Aggregate: ``list(value ORDER BY order_by)`` (DuckDB ``list``/``array_agg``).

    Keeps NULL values (matching DuckDB list aggregation); struct sort places
    NULL values last within equal keys, matching NULLS LAST.
    """
    return F.transform(_sorted_structs(order_by, value), lambda s: s["v"])


def ordered_string_agg(
    value: str | Column,
    order_by: str | Column,
    sep: str = ",",
    filter_cond: Column | None = None,
) -> Column:
    """Aggregate: ``STRING_AGG([CASE WHEN cond THEN] value, sep ORDER BY order_by)``.

    Reference semantics (arena.py:83-90): NULLs (including rows excluded by the
    CASE) are skipped; a group with no surviving value yields NULL, not ''.
    """
    v = F.col(value) if isinstance(value, str) else value
    if filter_cond is not None:
        v = F.when(filter_cond, v)
    k = F.col(order_by) if isinstance(order_by, str) else order_by
    # Pre-filter NULL values (STRING_AGG skips them); sort by key then value.
    structs = F.array_sort(
        F.collect_list(F.when(v.isNotNull(), F.struct(k.alias("k"), v.alias("v"))))
    )
    joined = F.array_join(F.transform(structs, lambda s: s["v"]), sep)
    return F.when(F.size(structs) > 0, joined)
