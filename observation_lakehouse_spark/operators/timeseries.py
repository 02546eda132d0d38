"""Time-series resampling and rate operators over irregular event streams.

The reference engine's `events`-style observability tables (SURVEY.md §1.2,
§2.9) are irregular samples: per-key readings at arbitrary timestamps. The
three canonical consumers of such a table that plain GROUP BY cannot express
are implemented here, each as a single-shuffle per-key window shape:

- :func:`gap_fill` — resample onto a fixed epoch-aligned grid, carrying the
  last observation forward through empty buckets (the dashboard/rollup shape).
- :func:`time_weighted_avg` — the mean of a step function held between
  samples, weighting each reading by how long it was current (the correct
  average for irregularly-sampled gauges; plain AVG over-weights bursts).
- :func:`counter_increase` — monotone-counter deltas with reset detection
  (the Prometheus ``increase()`` semantic): a drop in the raw value means the
  counter restarted, so the post-reset reading is itself the increase.

Scale notes (100 TB): every operator here shuffles ONCE on the entity key and
then runs ordered-window logic inside each partition — no self-joins, no
driver collection. ``gap_fill``'s grid explode is bounded per key by
(span / step), independent of corpus row count; the grid is generated with
``sequence()`` inside the partition, never materialized globally. Exact
arithmetic uses DECIMAL accumulators (sums of doubles are order-dependent
under Spark's non-deterministic partial aggregation; decimals are not).

Semantics only from the reference (events rollups, SURVEY §2.4 time grids);
no reference code was consulted for the implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dec6(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_us: int,
    strategy: str = "locf",
) -> DataFrame:
    """Resample irregular samples onto a fixed epoch-aligned grid.

    Buckets are ``floor(ts / step) * step`` (epoch-aligned, so buckets are
    comparable across keys). Per key the grid spans that key's observed
    range; buckets holding no sample are filled per ``strategy``:

    - ``"locf"`` — last-observation-carried-forward: the previous observed
      bucket's mean.
    - ``"linear"`` — linear interpolation between the previous and next
      observed bucket means by bucket distance (grid edges are always
      observed buckets, so both anchors exist). The interpolation runs in
      integer MICRO-UNITS of the 6dp anchors with an explicit floor division
      — re-ROUNDing a value derived from already-rounded anchors lands on
      decimal ties (measured 2 in 17k rows vs the SQL oracle), whereas
      floor-of-an-identical-IEEE-ratio is bit-deterministic across engines.

    Output: ``(key, bucket_us, n_obs, value, filled)`` where ``value`` is the
    bucket's mean reading, exact-decimal summed then rounded to 6dp.

    Plan shape: one hash aggregate onto (key, bucket), one per-key MIN/MAX
    aggregate whose ``sequence()`` explode regenerates the grid (bounded by
    span/step per key — never corpus-sized), one left join back onto the
    observed buckets, then per-key ordered window(s) for the anchors — the
    linear strategy adds only the mirrored following-window pass, no extra
    shuffle (same partitioning, opposite frame). AQE picks broadcast for the
    span side when small.
    """
    if strategy not in ("locf", "linear"):
        raise ValueError(f"strategy must be 'locf' or 'linear', got {strategy!r}")
    bucket = (F.col(ts_col) - (F.col(ts_col) % F.lit(step_us))).alias("bucket_us")
    obs = (
        df.select(F.col(key_col).alias("k"), bucket, _dec6(value_col).alias("v"))
        .groupBy("k", "bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            # exact decimal sum; the mean is one double division both engines
            # evaluate identically, then one terminal round.
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias("bucket_value"),
        )
    )
    spans = obs.groupBy("k").agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    grid = spans.select(
        "k", F.explode(F.sequence("lo", "hi", F.lit(step_us))).alias("bucket_us")
    )
    w_prev = (
        Window.partitionBy("k")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(obs, ["k", "bucket_us"], "left")
    if strategy == "locf":
        value = F.last("bucket_value", ignorenulls=True).over(w_prev)
    else:
        w_next = (
            Window.partitionBy("k")
            .orderBy("bucket_us")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        anchor = F.when(F.col("bucket_value").isNotNull(), F.col("bucket_us"))
        # anchors in exact integer micro-units (the 6dp double is within 1
        # ulp of its integer image — the to-integer round can never tie)
        pv = F.round(F.last("bucket_value", ignorenulls=True).over(w_prev) * 1e6).cast("bigint")
        pb = F.last(anchor, ignorenulls=True).over(w_prev)
        nv = F.round(F.first("bucket_value", ignorenulls=True).over(w_next) * 1e6).cast("bigint")
        nb = F.first(anchor, ignorenulls=True).over(w_next)
        # bucket steps, not raw microseconds: keeps the integer product far
        # from bigint range at any span
        sn = ((F.col("bucket_us") - pb) / F.lit(step_us)).cast("bigint")
        sd = ((nb - pb) / F.lit(step_us)).cast("bigint")
        interp_u = pv + F.floor(((nv - pv) * sn).cast("double") / sd.cast("double")).cast(
            "bigint"
        )
        value = F.when(F.col("bucket_value").isNotNull(), F.col("bucket_value")).otherwise(
            interp_u.cast("double") / F.lit(1e6)
        )
    return joined.select(
        F.col("k").alias(key_col),
        "bucket_us",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        value.alias("value"),
        F.col("bucket_value").isNull().alias("filled"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Time-weighted mean of a step function: each reading is held from its
    own timestamp until the next one, so it contributes ``value × Δt``.

    ``order_col`` breaks timestamp ties into a total order (tied samples get
    Δt = 0 — they were current for no time — deterministically on any
    partitioning). Keys with fewer than 2 samples or zero span are dropped:
    a single point has no duration to weight.

    Output: ``(key, n_samples, span_us, twa)`` with ``twa`` rounded to 6dp.
    Exactness: ``value`` is cast to DECIMAL(18,6) and multiplied by the
    BIGINT microsecond gap — the weighted sum is exact decimal arithmetic,
    order-independent under partial aggregation; only the final
    sum/span division runs in double.
    """
    w = Window.partitionBy("k").orderBy("t", "o")
    steps = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("t"),
            F.col(order_col).alias("o"),
            _dec6(value_col).alias("v"),
        )
        .withColumn("dt", F.lead("t").over(w) - F.col("t"))
        .withColumn("wv", F.col("v") * F.col("dt"))
    )
    return (
        steps.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            (F.max("t") - F.min("t")).alias("span_us"),
            F.sum("wv").alias("wsum"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            F.col("k").alias(key_col),
            "n_samples",
            "span_us",
            F.round(F.col("wsum").cast("double") / F.col("span_us"), 6).alias("twa"),
        )
    )


def counter_increase(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Monotone-counter total increase with reset detection (Prometheus
    ``increase()`` semantics, applied per key over the full series).

    Ordered by ``(ts, order_col)`` within each key: a sample's contribution
    is ``value - lag(value)`` when non-negative, else ``value`` (the counter
    restarted from zero — everything seen since the reset is new). The first
    sample contributes nothing (no preceding interval).

    Output: ``(key, n_samples, n_resets, total_increase)``; the increase is
    an exact DECIMAL(18,6) sum rounded to 6dp at the end.
    """
    w = Window.partitionBy("k").orderBy("t", "o")
    deltas = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("t"),
            F.col(order_col).alias("o"),
            _dec6(value_col).alias("v"),
        )
        .withColumn("prev", F.lag("v").over(w))
        .withColumn(
            "inc",
            F.when(F.col("prev").isNull(), F.lit(0).cast("decimal(18,6)"))
            .when(F.col("v") >= F.col("prev"), F.col("v") - F.col("prev"))
            .otherwise(F.col("v")),
        )
        .withColumn(
            "reset",
            (F.col("prev").isNotNull() & (F.col("v") < F.col("prev"))).cast("int"),
        )
    )
    return deltas.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum("reset").cast("bigint").alias("n_resets"),
        F.round(F.sum("inc").cast("double"), 6).alias("total_increase"),
    ).select(
        F.col("k").alias(key_col), "n_samples", "n_resets", "total_increase"
    )


def rolling_active_entities(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    window_buckets: int = 7,
    bucket_us: int = 86_400_000_000,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Sliding-window distinct entities (7-day-active-users shape): for every
    bucket in the observed range, how many distinct entities appeared in the
    trailing ``window_buckets`` buckets ending there.

    Exact sliding DISTINCT cannot be a window aggregate (distinct state does
    not merge subtractively), so the standard relational form is used: each
    distinct (entity, bucket) pair is exploded to the ``window_buckets``
    window-end buckets it contributes to, then a plain COUNT(DISTINCT) per
    window end. Windows are truncated to the observed bucket range (leading
    partial windows are reported, trailing empty ones are not).

    Output: ``(bucket_us, n_active)`` — window END bucket, trailing count.

    Scale: the explode factor is exactly ``window_buckets`` on the
    DEDUPLICATED (entity, bucket) pairs — bounded by entities x buckets, not
    by raw event volume (the first distinct collapses event cardinality at
    the scan). Both aggregates are hash shuffles with map-side partials. For
    very long windows where w x pairs is too hot, the mergeable-sketch path
    (per-bucket HLL partials merged over the window) trades exactness for a
    constant explode factor — pass ``exact=False`` for that variant:
    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``) over
    the same explode, mergeable across any partitioning. The approximate
    twin is test-bounded against the exact one, not oracle-hashed (sketch
    internals are engine-specific).
    """
    # persisted: the deduplicated pairs feed BOTH the bounds aggregate and
    # the window explode — without the boundary the corpus-wide distinct
    # runs twice. Caller releases via release_cached(out).
    pairs = df.select(
        (F.col(ts_col) - (F.col(ts_col) % F.lit(bucket_us))).alias("_b"),
        F.col(entity_col).alias("_e"),
    ).distinct().persist()
    bounds = pairs.agg(F.max("_b").alias("_hi"))
    wins = pairs.select(
        F.explode(
            F.sequence(
                "_b",
                F.col("_b") + F.lit((window_buckets - 1) * bucket_us),
                F.lit(bucket_us),
            )
        ).alias("bucket_us"),
        "_e",
    )
    counter = (
        F.countDistinct("_e") if exact else F.approx_count_distinct("_e", rsd)
    )
    out = (
        wins.join(F.broadcast(bounds), F.col("bucket_us") <= F.col("_hi"))
        .groupBy("bucket_us")
        .agg(counter.alias("n_active"))
        .orderBy("bucket_us")
    )
    out._cached_deps = (pairs,)  # noqa: SLF001 — release_cached contract
    return out


def m4_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """M4 visualization downsampling (Jugel, Fischer, Markl & Sattler,
    "M4: A Visualization-Oriented Time Series Data Aggregation", VLDB'14):
    per (key, time bucket) keep exactly the four values a pixel-perfect line
    rendering needs — min, max, first and last — so a dashboard serves a
    billion-point series from ~4·width rows with zero visual error.

    One hash aggregate per (key, bucket): min/max over the raw DOUBLE
    value (selection, not arithmetic — no accumulation order to pin, so
    doubles are exact cross-engine), first/last via lexicographic
    ``min/max(struct(ts, value))`` — the (ts, value) tie-break makes both
    ends deterministic under any partitioning, and a SQL oracle reproduces
    them with ROW_NUMBER over (ts, value) / (ts DESC, value DESC). The
    reference has no downsampling
    surface (its events queries are plain aggregates,
    /root/reference/olake/lakehouse.py:365-377); this is the standard
    serving-layer companion to the rollup operators above.

    Scale: ONE shuffle keyed (key, bucket) with full map-side combine — the
    exchange carries 4 values + 2 struct anchors per group, never samples.
    Output: (key, bucket_us, v_min, v_max, v_first, v_last, n_samples).
    """
    g = df.select(
        F.col(key_col),
        F.expr(f"CAST({ts_col} AS BIGINT) div {int(bucket_us)}").alias("_b"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return (
        g.groupBy(key_col, "_b")
        .agg(
            F.min("_v").alias("v_min"),
            F.max("_v").alias("v_max"),
            F.min(F.struct("_ts", "_v")).getField("_v").alias("v_first"),
            F.max(F.struct("_ts", "_v")).getField("_v").alias("v_last"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            key_col,
            (F.col("_b") * F.lit(int(bucket_us))).alias("bucket_us"),
            "v_min",
            "v_max",
            "v_first",
            "v_last",
            "n_samples",
        )
        .orderBy(key_col, "bucket_us")
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition over per-key bucket means:
    ``value = trend + seasonal + residual`` (the moving-average method of
    classical decomposition; the deterministic batch sibling of STL).

    Per (key, bucket): the bucket mean in exact integer micro-units
    (``sum(value·1e6) div n`` — no float division anywhere, so a SQL oracle
    bit-agrees). Trend: centered moving average over ``period`` consecutive
    OBSERVED buckets (row frame, ``period`` odd required; NULL at the edges
    where the window is incomplete — the classical convention). Phase:
    ``bucket mod period``. Seasonal: per (key, phase) mean of the detrended
    values where trend exists, re-centered so the seasonal components sum
    to ~0 over a period (grand-mean subtraction, integer div). Residual:
    ``value − trend − seasonal``.

    Scale shape: one (key, bucket) hash aggregate, one per-key ordered
    window (row-based, sees ``period`` rows), one (key, phase) hash
    aggregate joined back — all keyed shuffles, nothing corpus-global.
    Gaps: the row-frame window treats the observed bucket sequence as
    contiguous; resample through :func:`gap_fill` first when true
    calendar adjacency matters.

    Output: (key, bucket_us, phase, value_micro, trend_micro,
    seasonal_micro, residual_micro).
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    half = period // 2
    means = (
        df.select(
            F.col(key_col),
            F.expr(f"CAST({ts_col} AS BIGINT) div {int(bucket_us)}").alias("_b"),
            (_dec6(value_col) * F.lit(1_000_000)).cast("long").alias("_vm"),
        )
        .groupBy(key_col, "_b")
        .agg(F.expr("SUM(_vm) div COUNT(*)").alias("value_micro"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(-half, half)
    )
    trended = means.select(
        key_col,
        "_b",
        F.pmod(F.col("_b"), F.lit(period)).alias("phase"),
        "value_micro",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.expr(f"SUM(value_micro) OVER (PARTITION BY {key_col} ORDER BY _b "
                   f"ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING) div {period}"),
        ).alias("trend_micro"),
    )
    detr = trended.withColumn(
        "_d", F.col("value_micro") - F.col("trend_micro")
    )
    seas_raw = (
        detr.filter(F.col("_d").isNotNull())
        .groupBy(key_col, "phase")
        .agg(F.expr("SUM(_d) div COUNT(*)").alias("_s_raw"))
    )
    grand = seas_raw.groupBy(key_col).agg(
        F.expr(f"SUM(_s_raw) div {period}").alias("_g")
    )
    seas = seas_raw.join(grand, key_col).select(
        key_col, "phase", (F.col("_s_raw") - F.col("_g")).alias("seasonal_micro")
    )
    return (
        trended.join(seas, [key_col, "phase"], "left")
        .select(
            key_col,
            (F.col("_b") * F.lit(int(bucket_us))).alias("bucket_us"),
            "phase",
            "value_micro",
            "trend_micro",
            "seasonal_micro",
            (
                F.col("value_micro") - F.col("trend_micro") - F.col("seasonal_micro")
            ).alias("residual_micro"),
        )
        .orderBy(key_col, "bucket_us")
    )


def cusum_drift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    threshold_micro: int,
) -> DataFrame:
    """One-sided CUSUM drift detection per key (Page 1954's cumulative-sum
    chart — the standard "has this metric's level shifted?" monitor):
    over per-bucket means, accumulate deviations from the key's own global
    mean and flag when the accumulation exceeds ``threshold_micro``.

    The textbook recursion ``s_t = max(0, s_{t-1} + dev_t)`` is not a
    window function — but it has a closed form: with ``cum_t = Σ_{j≤t}
    dev_j``, ``s_t = cum_t − min_{j≤t} cum_j`` (the running sum minus its
    running minimum; the min acts as the last reset point). That makes
    CUSUM two ordered windows per key — running SUM and running MIN —
    both single-shuffle, no recursion, no UDF, and exactly replayable in
    SQL. All arithmetic in integer micro-units: bucket mean = ``sum div
    n``; the reference level is the key's mean-of-bucket-means (``div``
    again), so both engines see identical integers end to end.

    Output: (key, bucket_us, value_micro, dev_micro, cusum_micro,
    drifted), ordered (key, bucket) — ``drifted`` marks every bucket whose
    CUSUM exceeds the threshold (the alert condition; the FIRST such
    bucket per key is the detected change point).
    """
    means = (
        df.select(
            F.col(key_col),
            F.expr(f"CAST({ts_col} AS BIGINT) div {int(bucket_us)}").alias("_b"),
            (F.col(value_col).cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("_vm"),
        )
        .groupBy(key_col, "_b")
        .agg(F.expr("SUM(_vm) div COUNT(*)").alias("value_micro"))
    )
    ref = means.groupBy(key_col).agg(
        F.expr("SUM(value_micro) div COUNT(*)").alias("_ref")
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    devs = means.join(ref, key_col).select(
        key_col,
        "_b",
        "value_micro",
        (F.col("value_micro") - F.col("_ref")).alias("dev_micro"),
    )
    out = devs.select(
        key_col,
        "_b",
        "value_micro",
        "dev_micro",
        F.sum("dev_micro").over(w_cum).alias("_cum"),
    ).select(
        key_col,
        "_b",
        "value_micro",
        "dev_micro",
        (
            F.col("_cum")
            - F.min(F.least(F.col("_cum"), F.lit(0))).over(w_cum)
            # the reset floor includes the virtual s_0 = 0 start: min over
            # (0, cum_1..cum_t) — otherwise an initial positive run would
            # measure from cum_1 instead of 0
        ).alias("cusum_micro"),
    )
    return (
        out.withColumn(
            "drifted", F.col("cusum_micro") > F.lit(int(threshold_micro))
        )
        .select(
            key_col,
            (F.col("_b") * F.lit(int(bucket_us))).alias("bucket_us"),
            "value_micro",
            "dev_micro",
            "cusum_micro",
            "drifted",
        )
        .orderBy(key_col, "bucket_us")
    )


def autocorrelation(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Sample autocorrelation (ACF) of a per-key series at the given lags —
    the seasonality/memory diagnostic next to seasonal_decompose (a spike at
    lag p says "period p structure"; all-near-zero says the residual is
    noise).

    Per (key, lag): Pearson correlation of (x_t, x_{t−lag}) pairs, paired by
    ONE key-partitioned window ordered by ``order_cols`` (which must be a
    total order — include a unique id) then pivoted long via ``stack`` (one
    window pass for ALL lags, not one per lag). Co-moments accumulate as
    EXACT decimals cast to double once, so both engines evaluate the
    identical float tree (the regression_stats discipline); degenerate
    windows (either side constant, or fewer than 2 pairs) return NULL rather
    than a float-division artifact.

    Output: (key, lag, n_pairs, acf) ordered by (key, lag). Scale: the only
    shuffle is the key-partitioned window; the lag stack is a constant ×len(
    lags) map-side explode and the co-moment aggregate combines map-side.
    """
    from pyspark.sql import Window

    if not lags or any(int(k) < 1 for k in lags):
        raise ValueError("lags must be positive ints")
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    lag_cols = [
        F.lag(value_col, int(k)).over(w).alias(f"_lag{k}") for k in lags
    ]
    stack_args = ", ".join(f"{int(k)}, _lag{k}" for k in lags)
    pairs = (
        df.select(F.col(key_col), F.col(value_col).alias("_x"), *lag_cols)
        .selectExpr(key_col, "_x", f"stack({len(lags)}, {stack_args}) AS (lag, _y)")
        .filter(F.col("_y").isNotNull())
    )
    x = F.col("_x").cast("decimal(18,2)")
    y = F.col("_y").cast("decimal(18,2)")
    agg = pairs.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(x).cast("double").alias("_sx"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum(x * y).cast("double").alias("_sxy"),
        F.sum(x * x).cast("double").alias("_sx2"),
        F.sum(y * y).cast("double").alias("_sy2"),
    )
    n = F.col("n_pairs").cast("double")
    cov = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n
    vx = F.col("_sx2") - F.col("_sx") * F.col("_sx") / n
    vy = F.col("_sy2") - F.col("_sy") * F.col("_sy") / n
    acf = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0) & (vy > 0),
        F.round(cov / F.sqrt(vx * vy), 6),
    )
    return agg.select(key_col, "lag", "n_pairs", acf.alias("acf")).orderBy(
        key_col, "lag"
    )
