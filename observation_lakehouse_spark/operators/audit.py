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


def ks_test(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic — the standard
    "did this drop's distribution move?" gate between a reference corpus
    and a candidate one, computed exactly at any scale (the usual KS
    implementations sort both samples on one machine; approximate ones
    bucket first and lose the sup).

    ``D = sup_x |F_ref(x) − F_cur(x)|`` over the pooled distinct values:
    with per-value counts (c1, c2) and INCLUSIVE cumulative counts
    (C1, C2), the numerator is ``max |C1·n2 − C2·n1|`` — exact integers,
    no float ECDF anywhere; ``ks_ppm = D_num·1e6 div (n1·n2)``. Values
    micro-quantize through the decimal-cast discipline so both engines
    bucket identically.

    Scale shape: one (value → c1, c2) hash aggregate over the union
    (map-side combinable), then ONE distributed prefix pass over the
    distinct-value table (:func:`~observation_lakehouse_spark.functions.
    prefix.global_prefix_sums` carries both cumulative counts in the same
    range shuffle), one max aggregate. Never a corpus-wide single-task
    sort. Output: one row (n_ref, n_cur, d_num, ks_ppm). Caller releases
    the persisted range stage via ``release_cached``.
    """
    from observation_lakehouse_spark.functions.prefix import global_prefix_sums

    v_micro = (F.col(value_col).cast("decimal(18,6)") * MICRO).cast("long")
    # NULL values are dropped BEFORE the prefix pass: global_prefix_sums'
    # contract requires a non-null order column (functions/prefix.py) —
    # a NULL group would range-sort first and silently occupy the lowest
    # value bucket, shifting both ECDFs. KS is a statistic over observed
    # values; missingness is a different monitor's job.
    nn = F.col(value_col).isNotNull()
    tagged = (
        ref.filter(nn)
        .select(v_micro.alias("_v"), F.lit(1).alias("_s"))
        .unionByName(cur.filter(nn).select(v_micro.alias("_v"), F.lit(2).alias("_s")))
    )
    per_val = tagged.groupBy("_v").agg(
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("_s") == 2, 1).otherwise(0)).alias("c2"),
    )
    cum = global_prefix_sums(
        per_val, "_v", ["c1", "c2"], ["cum1", "cum2"], inclusive=True
    )
    # totals must be known per row for the |C1·n2 − C2·n1| term: one tiny
    # single-row aggregate broadcast back (the deliberate 1-row pattern)
    totals = cum.agg(
        F.sum("c1").alias("n_ref"), F.sum("c2").alias("n_cur")
    )
    out = (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_ref",
            "n_cur",
            F.abs(
                F.col("cum1") * F.col("n_cur") - F.col("cum2") * F.col("n_ref")
            ).alias("_d"),
        )
        .groupBy("n_ref", "n_cur")
        .agg(F.max("_d").alias("d_num"))
        .select(
            "n_ref",
            "n_cur",
            "d_num",
            # one-sided input (a sample with zero rows): D is undefined —
            # NULL, never an ANSI divide-by-zero (the guard is load-bearing:
            # Spark 4 raises on div 0)
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.expr(f"(d_num * {MICRO}) div (n_ref * n_cur)"),
            ).alias("ks_ppm"),
        )
    )
    out._cached_deps = getattr(cum, "_cached_deps", ())  # noqa: SLF001
    return out


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current sample
    — the monitoring industry's binned drift score (PSI < 0.1 stable,
    > 0.25 shifted): ``PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)`` with
    add-one-smoothed bin shares so empty bins stay finite.

    Determinism (the dsir/xent discipline): values micro-quantize and bin
    equi-width over the declared ``[lo, hi)`` (edges clamp into the end
    bins — PSI needs a FIXED binning shared by both samples, so the range
    is a declared contract, not data-derived); each bin's share is an
    exact ppm floor div, the log-ratio is ONE integer ratio
    ``(c_ref+1)·(N_cur+K) / ((c_cur+1)·(N_ref+K))`` cast to double for a
    single correctly-rounded quotient, rounded to integer micro-nats; the
    contribution is ``(p_ppm − q_ppm)·lr_micro div 1e6`` — pure integer,
    emitted PER BIN so the oracle checks the whole decomposition
    (calibration_report's pattern; the PSI is the column sum).

    One hash aggregate per sample side folded in a single union pass + a
    K-row total window. Output: (bin, n_ref, n_cur, p_ppm, q_ppm,
    lr_micro_nats, psi_contrib_micro), ordered by bin.
    """
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    from pyspark.sql import Window

    lo_u = int(round(lo * MICRO))
    hi_u = int(round(hi * MICRO))
    span = max(1, (hi_u - lo_u) // n_bins)
    v_micro = (F.col(value_col).cast("decimal(18,6)") * MICRO).cast("long")
    bin_expr = F.floor(
        (
            F.least(F.lit(hi_u - 1), F.greatest(F.lit(lo_u), v_micro)) - F.lit(lo_u)
        )
        / F.lit(span)
    )
    bin_clamped = F.least(F.lit(int(n_bins) - 1), bin_expr).alias("bin")
    # NULL values are excluded from BOTH samples' bin counts and totals
    # (explicitly — Spark's greatest/least SKIP NULL arguments, so an
    # unfiltered NULL would silently clamp into bin 0, not drop out).
    # PSI compares the distributions of observed values; track missingness
    # with a separate null-rate monitor if it matters.
    nn = F.col(value_col).isNotNull()
    tagged = (
        ref.filter(nn)
        .select(bin_clamped, F.lit(1).alias("_s"))
        .unionByName(cur.filter(nn).select(bin_clamped, F.lit(2).alias("_s")))
    )
    per_bin = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("_s") == 2, 1).otherwise(0)).alias("n_cur"),
    )
    total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    k = int(n_bins)
    wb = per_bin.withColumn("_NR", F.sum("n_ref").over(total)).withColumn(
        "_NC", F.sum("n_cur").over(total)
    )
    return (
        wb.select(
            "bin",
            "n_ref",
            "n_cur",
            F.expr(f"((n_ref + 1) * {MICRO}) div (_NR + {k})").alias("p_ppm"),
            F.expr(f"((n_cur + 1) * {MICRO}) div (_NC + {k})").alias("q_ppm"),
            F.round(
                F.log(
                    F.expr(
                        f"CAST(CAST(n_ref + 1 AS DECIMAL(38,0)) * (_NC + {k}) AS DOUBLE)"
                    )
                    / F.expr(
                        f"CAST(CAST(n_cur + 1 AS DECIMAL(38,0)) * (_NR + {k}) AS DOUBLE)"
                    )
                )
                * 1_000_000.0
            )
            .cast("long")
            .alias("lr_micro_nats"),
        )
        .select(
            "bin",
            "n_ref",
            "n_cur",
            "p_ppm",
            "q_ppm",
            "lr_micro_nats",
            F.expr(
                f"((p_ppm - q_ppm) * lr_micro_nats) div {MICRO}"
            ).alias("psi_contrib_micro"),
        )
        .orderBy("bin")
    )


def chi2_test(ref: DataFrame, cur: DataFrame, cat_col: str) -> DataFrame:
    """Pearson χ² homogeneity test between two CATEGORICAL samples — the
    drift gate for label/segment/source-mix columns, completing the family
    (ks_test: continuous exact, psi_drift: binned continuous, this:
    categorical). TRUE two-sample homogeneity (r10, was goodness-of-fit
    against the reference — the r9 advisory): both samples' ``(O − E)²/E``
    terms against the POOLED expectation, which algebraically collapses to
    ``χ² = Σ_c (r_c·N_C − o_c·N_R)² / (N_R·N_C·(r_c + o_c))`` — one term per
    category, df = K−1. Add-one smoothed on every category of the UNION
    (like psi_drift's bins: a category seen on only one side stays finite
    instead of dividing by a zero expectation).

    Determinism: all inputs to the per-category float expression are exact
    smoothed BIGINT counts shared by both engines, each factor casts to
    DOUBLE BEFORE multiplying (no integer-overflow path at any scale), and
    the contribution rounds ONCE to integer micro-units — the statistic is
    then an exact integer sum (the composite-score discipline). NULL
    categories are excluded like the other drift ops (track missingness
    separately).

    One union + hash aggregate to |categories| rows, then a bounded
    (|categories|-row) total window. Output per category: (category, n_ref,
    n_cur, ref_ppm, cur_ppm, contrib_micro, chi2_micro, df), ordered by
    category — the whole decomposition is oracle-checkable, χ² is the
    shared ``chi2_micro`` value.
    """
    from pyspark.sql import Window

    nn = F.col(cat_col).isNotNull()
    tagged = (
        ref.filter(nn)
        .select(F.col(cat_col).alias("category"), F.lit(1).alias("_s"))
        .unionByName(
            cur.filter(nn).select(F.col(cat_col).alias("category"), F.lit(2).alias("_s"))
        )
    )
    per_cat = tagged.groupBy("category").agg(
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("_s") == 2, 1).otherwise(0)).alias("n_cur"),
    )
    return chi2_from_counts(per_cat)


def chi2_from_counts(per_cat: DataFrame) -> DataFrame:
    """:func:`chi2_test`'s math over a PRE-AGGREGATED (category, n_ref,
    n_cur) table — the seam the streaming monitor shares, so the live
    report is bit-identical to the batch operator by construction."""
    from pyspark.sql import Window

    total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wb = (
        per_cat.withColumn("_K", F.count(F.lit(1)).over(total))
        .withColumn("_NR", F.sum("n_ref").over(total) + F.col("_K"))
        .withColumn("_NC", F.sum("n_cur").over(total) + F.col("_K"))
        .withColumn("_r", F.col("n_ref") + 1)
        .withColumn("_o", F.col("n_cur") + 1)
    )
    num = (
        F.col("_o").cast("double") * F.col("_NR").cast("double")
        - F.col("_NC").cast("double") * F.col("_r").cast("double")
    )
    # Pooled-expectation homogeneity: both samples' (O-E)^2/E terms sum to
    # Δ²/(NR·NC·(r+o)) per category — see chi2_test's docstring identity.
    den = (
        F.col("_NR").cast("double")
        * F.col("_NC").cast("double")
        * (F.col("_r").cast("double") + F.col("_o").cast("double"))
    )
    contrib = F.round(num * num / den * F.lit(1_000_000.0)).cast("long")
    return (
        wb.select(
            "category",
            "n_ref",
            "n_cur",
            F.expr(f"(_r * {MICRO}) div _NR").alias("ref_ppm"),
            F.expr(f"(_o * {MICRO}) div _NC").alias("cur_ppm"),
            contrib.alias("contrib_micro"),
            (F.col("_K") - 1).alias("df"),
        )
        .withColumn("chi2_micro", F.sum("contrib_micro").over(total))
        .select(
            "category", "n_ref", "n_cur", "ref_ppm", "cur_ppm",
            "contrib_micro", "chi2_micro", "df",
        )
        .orderBy("category")
    )
