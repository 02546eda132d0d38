"""Data-quality and privacy audits for training-data curation.

Pre-training gates a 100 TB pipeline runs before a corpus snapshot is
admitted: declarative constraint checks (the Deequ/Great-Expectations
shape — completeness, uniqueness, domain and range conformance computed in
ONE aggregate pass) and k-anonymity profiling over quasi-identifier columns
with a generalization ladder (Sweeney, IJUFKS'02). Both emit integer
micro-unit metrics so results are exact, order-independent across shuffles,
and replayable bit-for-bit by a SQL oracle.

No reference counterpart: the reference engine (DuckDB SQL + PyIceberg
plumbing) ships no audit surface; these follow the repo's LLM-pipeline
mandate. Spark-first shapes: constraint_audit is a single whole-stage-
codegen aggregate (metrics unpivoted AFTER aggregation — the scan happens
once no matter how many checks ride it); k_anonymity_profile is one
groupBy per generalization level, each level re-aggregating ONLY the rows
of still-failing groups (monotonically shrinking, semi-join pruned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def ratio_micro(num: Column, den: Column) -> Column:
    """Exact integer parts-per-million of num/den (both nonnegative):
    floor((1e6*num)/den) computed in DECIMAL so it stays exact past 2^53
    (a double ratio would lose ulps at petabyte-scale counts); the DuckDB
    twin is bigint ``(1000000*num) // den``. No float ever crosses the
    pass/fail comparison."""
    wide = (F.lit(MICRO).cast("decimal(38,0)") * num.cast("decimal(38,0)")) / den.cast(
        "decimal(38,0)"
    )
    return F.floor(wide).cast("long")


def constraint_audit(df: DataFrame, checks) -> DataFrame:
    """Evaluate declarative quality constraints in ONE aggregate pass.

    ``checks`` is a list of (name, metric aggregate Column in integer
    micro-units, passed: Callable[[Column], Column] over the aggregated
    metric). Returns one row per check: (check, metric_micro, passed),
    ordered by check name.

    Shape: a single ``df.agg(*metrics)`` — every metric is a map-side-
    combinable aggregate over the same scan, so adding checks never adds
    passes (the Deequ batch-of-analyzers design) — then an unpivot of the
    1-row result via posexplode of a literal-name array. Exact
    ``countDistinct`` inside a check triggers Spark's Expand (one extra
    shuffled pass for that column, audit-grade exactness); the profiling
    family's ``approx_count_distinct`` twin is the 100 TB default when a
    2-3% uniqueness error is acceptable (operators/stats.py HLL pattern).
    """
    agg = df.agg(*[m.alias(f"_m{i}") for i, (_, m, _) in enumerate(checks)])
    passed = agg.select(
        *[F.col(f"_m{i}") for i in range(len(checks))],
        *[p(F.col(f"_m{i}")).alias(f"_p{i}") for i, (_, _, p) in enumerate(checks)],
    )
    names = F.array(*[F.lit(n) for n, _, _ in checks])
    metrics = F.array(*[F.col(f"_m{i}").cast("long") for i in range(len(checks))])
    flags = F.array(*[F.col(f"_p{i}") for i in range(len(checks))])
    return (
        passed.select(F.posexplode(names).alias("_i", "check"), metrics.alias("_ms"), flags.alias("_fs"))
        .select(
            "check",
            F.element_at("_ms", F.col("_i") + 1).alias("metric_micro"),
            F.element_at("_fs", F.col("_i") + 1).alias("passed"),
        )
        .orderBy("check")
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi: list[tuple[str, Column]],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit with a drop-last generalization ladder.

    ``quasi`` lists the quasi-identifier columns most-to-least identifying
    as (name, expression); every expression is audited as a string (numeric
    QIs arrive pre-binned, e.g. ``floor(bal/1000)``). Level 0 groups rows
    by the full QI tuple; any group smaller than ``k`` is re-identifiable
    (Sweeney's linkage attack), so its ROWS climb to level 1 where the last
    QI is generalized to ``*`` and the count re-checks — and so on until
    one QI remains. Groups still under ``k`` at the top level are emitted
    ``anonymous = false``: the suppression set a release would drop.

    Returns (level, qi, group_n, anonymous): ``qi`` is the pipe-joined QI
    tuple with ``*`` in generalized slots (plain strings — array columns
    stringify differently across engines), ordered (level, qi).

    At 100 TB: each level is one hash aggregate keyed by the (shrinking)
    QI prefix plus one broadcast left-semi join pruning to failing-group
    rows — failing keys number < (distinct groups), and each level's input
    is only the previous level's failing rows, so work decays geometrically
    while the ladder depth is fixed at ``len(quasi) - 1``.
    """
    if not quasi:
        raise ValueError("k_anonymity_profile needs at least one quasi-identifier")
    names = [n for n, _ in quasi]
    work = df.select(*[c.cast("string").alias(n) for n, c in quasi])
    parts: list[DataFrame] = []
    cur = work
    for level in range(len(names)):
        keys = names[: len(names) - level]
        g = cur.groupBy(*keys).agg(F.count(F.lit(1)).alias("group_n"))
        star = [F.lit("*")] * level
        qi = F.concat_ws("|", *[F.col(kc) for kc in keys], *star)
        last = level == len(names) - 1
        emit = g if last else g.filter(F.col("group_n") >= k)
        parts.append(
            emit.select(
                F.lit(level).alias("level"),
                qi.alias("qi"),
                "group_n",
                (F.col("group_n") >= k).alias("anonymous"),
            )
        )
        if last:
            break
        failing = g.filter(F.col("group_n") < k).select(*keys)
        cur = cur.join(F.broadcast(failing), keys, "left_semi")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("level", "qi")


def referential_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Cross-table referential-integrity audit: how many child rows point at
    a parent key that does not exist (FK orphans), plus the NULL-key count —
    the two ways a foreign key goes bad (Deequ's Referential Integrity
    analyzer; :func:`constraint_audit` is single-table by design, so this
    is its cross-table sibling).

    Output, one row per metric: (check, metric_micro, passed) in the same
    shape as :func:`constraint_audit` — `fk_orphans` / `fk_nulls` report
    raw counts × MICRO (so a dashboard treats every audit row uniformly),
    `fk_coverage` reports matched/non-null parts-per-million.

    Scale shape: ONE left-semi-style join decides existence — expressed as
    a left join against the DISTINCT parent keys (keys-sized right side;
    broadcastable when the parent key set fits, AQE decides) — then a
    single-row conditional aggregate. Child payload columns are pruned at
    the scan; only the key column shuffles.
    """
    keys = parent.select(F.col(parent_key).alias("_pk")).distinct()
    flagged = (
        child.select(F.col(child_key).alias("_ck"))
        .join(keys, F.col("_ck") == F.col("_pk"), "left")
        .select(
            F.col("_ck").isNull().alias("_is_null"),
            (F.col("_ck").isNotNull() & F.col("_pk").isNull()).alias("_is_orphan"),
        )
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_is_null").cast("long")).alias("_nulls"),
        F.sum(F.col("_is_orphan").cast("long")).alias("_orphans"),
    )
    rows = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("fk_coverage").alias("check"),
                    ratio_micro(
                        F.col("_n") - F.col("_nulls") - F.col("_orphans"),
                        F.greatest(F.col("_n") - F.col("_nulls"), F.lit(1)),
                    ).alias("metric_micro"),
                    (F.col("_orphans") == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("fk_nulls").alias("check"),
                    (F.col("_nulls") * F.lit(MICRO)).alias("metric_micro"),
                    (F.col("_nulls") == 0).alias("passed"),
                ),
                F.struct(
                    F.lit("fk_orphans").alias("check"),
                    (F.col("_orphans") * F.lit(MICRO)).alias("metric_micro"),
                    (F.col("_orphans") == 0).alias("passed"),
                ),
            )
        ).alias("r")
    )
    return rows.select("r.check", "r.metric_micro", "r.passed").orderBy("check")


def sample_ratio_check(
    df: DataFrame,
    variant: Column,
    group_col: str = "event_type",
) -> DataFrame:
    """Sample-ratio-mismatch (SRM) detection for 50/50 experiment splits —
    the first health check an A/B platform runs (Fabijan et al., KDD'19
    "Diagnosing Sample Ratio Mismatch"): if the traffic split differs from
    the assignment design, every downstream metric is suspect.

    Per group: observed counts per arm and the 1-dof chi-square statistic
    against equal expected counts, which for two arms reduces to
    ``(n_a - n_b)^2 / n`` — computed here as EXACT integer micro-units
    ``((n_a - n_b)^2 * 1e6) DIV n``, flagged against the literal
    chi2(0.95, 1df) = 3.841459 threshold. No float ever crosses the
    pass/fail comparison, so the verdict is engine- and partitioning-
    independent.

    Scale shape: ONE conditional-count hash aggregate over the scan (the
    arm indicator is a column expression, not a join against an assignment
    table), |groups| rows out.
    """
    arm_a = F.when(variant, 1).otherwise(0)
    out = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.sum(arm_a).alias("n_a"),
            F.sum(1 - arm_a).alias("n_b"),
        )
        .select(
            "grp",
            "n_a",
            "n_b",
            F.expr(
                "((n_a - n_b) * (n_a - n_b) * 1000000) DIV (n_a + n_b)"
            ).alias("chi2_micro"),
        )
        .withColumn("srm", F.col("chi2_micro") > F.lit(3_841_459))
        .orderBy("grp")
    )
    return out
