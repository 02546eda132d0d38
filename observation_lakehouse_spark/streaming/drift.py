"""Streaming PSI drift monitor — the continuous twin of
:func:`~observation_lakehouse_spark.operators.audit.psi_drift`.

The deployment shape of drift monitoring: the REFERENCE histogram is frozen
once (the distribution the model/filters were tuned on — K small rows), and
the live side's per-bin counts are maintained over the event stream,
exactly-once under the (checkpoint, batch_id) protocol of
:func:`~observation_lakehouse_spark.streaming.mv_refresh.stream_mv_refresh`
(a replayed fold would inflate bins and manufacture drift). ``report()``
derives the batch operator's exact per-bin decomposition — shares, single-
quotient micro-nat log-ratios, contributions — over the union of reference
and observed bins, so the live report EQUALS ``psi_drift(ref, delivered)``
bit-for-bit (pinned by tests/test_stream_drift.py). State is O(n_bins)
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.plans.incremental import IncrementalAggregate
from observation_lakehouse_spark.streaming.mv_refresh import stream_mv_refresh

MICRO = 1_000_000


class StreamingPsiMonitor:
    """Per-bin current-side counts vs a frozen reference histogram."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        ref: DataFrame,
        value_col: str = "value",
        lo: float = 0.0,
        hi: float = 1.0,
        n_bins: int = 10,
    ) -> None:
        if n_bins < 1 or not hi > lo:
            raise ValueError("need n_bins >= 1 and hi > lo")
        self.spark = spark
        self.value_col = value_col
        self.n_bins = int(n_bins)
        self.lo_u = int(round(lo * MICRO))
        self.hi_u = int(round(hi * MICRO))
        self.span = max(1, (self.hi_u - self.lo_u) // self.n_bins)
        # freeze the reference histogram NOW — K rows collected once; the
        # monitor's whole point is a fixed yardstick
        self.ref_bins: list[tuple[int, int]] = sorted(
            (int(r["bin"]), int(r["n"]))
            for r in ref.select(self._bin_expr(value_col).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        self.n_ref_total = sum(n for _, n in self.ref_bins)
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["bin"],
            key_types=["bigint"],
            aggs={"n_cur": ("count", "1")},
            agg_types={"n_cur": "bigint"},
        )

    def _bin_expr(self, col: str):
        v_micro = (F.col(col).cast("decimal(18,6)") * MICRO).cast("long")
        return F.least(
            F.lit(self.n_bins - 1),
            F.floor(
                (
                    F.least(F.lit(self.hi_u - 1), F.greatest(F.lit(self.lo_u), v_micro))
                    - F.lit(self.lo_u)
                )
                / F.lit(self.span)
            ),
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        return stream_mv_refresh(
            self.mv,
            stream.select(self._bin_expr(self.value_col).alias("bin")),
            checkpoint=checkpoint,
            available_now=available_now,
        )

    def report(self) -> DataFrame:
        """psi_drift's exact per-bin rows over (frozen reference, delivered
        stream): (bin, n_ref, n_cur, p_ppm, q_ppm, lr_micro_nats,
        psi_contrib_micro), ordered by bin. The PSI is the contribution
        sum."""
        ref_df = self.spark.createDataFrame(
            self.ref_bins or [], "bin bigint, _nr bigint"
        )
        cur = self.mv.read().select("bin", F.col("n_cur").alias("_nc"))
        merged = (
            ref_df.join(cur, "bin", "full_outer")
            .select(
                "bin",
                F.coalesce("_nr", F.lit(0)).alias("n_ref"),
                F.coalesce("_nc", F.lit(0)).alias("n_cur"),
            )
        )
        total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        k = self.n_bins
        wb = merged.withColumn("_NR", F.sum("n_ref").over(total)).withColumn(
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
                F.expr(f"((p_ppm - q_ppm) * lr_micro_nats) div {MICRO}").alias(
                    "psi_contrib_micro"
                ),
            )
            .orderBy("bin")
        )


class StreamingTermDriftMonitor:
    """Continuous twin of :func:`~observation_lakehouse_spark.operators.
    text.jsd_term_divergence` — WHICH WORDS are moving, live.

    The reference's ``top_k`` most frequent terms are frozen at construction
    (count DESC, term ASC — deterministic); every other token folds into the
    ``__other__`` bucket, so the maintained state is O(top_k) FOREVER no
    matter the stream's vocabulary (an unbounded per-term state table would
    be the classic streaming-vocabulary leak). Live counts fold exactly-once
    under the (checkpoint, batch_id) protocol. ``report()`` emits the batch
    operator's exact per-term JSD decomposition over the frozen terms (+
    ``__other__``): for every frozen term the row is BIT-IDENTICAL to
    ``jsd_term_divergence(ref, delivered)``'s row for that term — the token
    totals agree because the other-bucket still counts its tokens (pinned
    by tests/test_stream_drift.py).
    """

    OTHER = "__other__"

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        ref: DataFrame,
        text_col: str = "text",
        top_k: int = 200,
    ) -> None:
        from observation_lakehouse_spark.functions.text import lower_tokens

        if top_k < 1:
            raise ValueError("top_k must be >= 1")
        self.spark = spark
        self.text_col = text_col
        all_ref = (
            ref.select(F.explode(lower_tokens(text_col)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = all_ref.orderBy(F.desc("n"), F.asc("term")).limit(int(top_k)).collect()
        self.terms: list[str] = sorted(r["term"] for r in top)
        kept = {r["term"]: int(r["n"]) for r in top}
        n_total = int(
            all_ref.agg(F.sum("n").alias("t")).collect()[0]["t"] or 0
        )
        if n_total == 0:
            raise ValueError("reference corpus has no tokens")
        self.ref_counts: dict[str, int] = dict(kept)
        self.ref_counts[self.OTHER] = n_total - sum(kept.values())
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["term"],
            key_types=["string"],
            aggs={"n_cur": ("count", "1")},
            agg_types={"n_cur": "bigint"},
        )

    def _term_expr(self):
        t = F.col("term")
        return F.when(t.isin(*self.terms), t).otherwise(F.lit(self.OTHER))

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        from observation_lakehouse_spark.functions.text import lower_tokens

        mapped = stream.select(
            F.explode(lower_tokens(self.text_col)).alias("term")
        ).select(self._term_expr().alias("term"))
        return stream_mv_refresh(
            self.mv, mapped, checkpoint=checkpoint, available_now=available_now
        )

    def report(self) -> DataFrame:
        """jsd_term_divergence's exact per-term rows over (frozen reference,
        delivered stream): (term, c_ref, c_cur, p_ppm, q_ppm,
        jsd_contrib_micro), contribution DESC, term ASC. Total JSD is the
        contribution sum; ``__other__`` aggregates the unfrozen tail."""
        ref_df = self.spark.createDataFrame(
            list(self.ref_counts.items()), "term string, _nr bigint"
        )
        cur = self.mv.read().select("term", F.col("n_cur").alias("_nc"))
        merged = ref_df.join(cur, "term", "full_outer").select(
            "term",
            F.coalesce("_nr", F.lit(0)).alias("c1"),
            F.coalesce("_nc", F.lit(0)).alias("c2"),
        )
        total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        wb = merged.withColumn("n1", F.sum("c1").over(total)).withColumn(
            "n2", F.sum("c2").over(total)
        )
        lr1 = F.log(
            F.expr("CAST(2 * CAST(c1 AS DECIMAL(38,0)) * n2 AS DOUBLE)")
            / F.expr(
                "CAST(CAST(c1 AS DECIMAL(38,0)) * n2 + CAST(c2 AS DECIMAL(38,0)) * n1 AS DOUBLE)"
            )
        )
        lr2 = F.log(
            F.expr("CAST(2 * CAST(c2 AS DECIMAL(38,0)) * n1 AS DOUBLE)")
            / F.expr(
                "CAST(CAST(c1 AS DECIMAL(38,0)) * n2 + CAST(c2 AS DECIMAL(38,0)) * n1 AS DOUBLE)"
            )
        )
        return (
            wb.filter((F.col("n1") > 0) & (F.col("n2") > 0))
            .select(
                "term",
                F.col("c1").alias("c_ref"),
                F.col("c2").alias("c_cur"),
                F.expr(f"(c1 * {MICRO}) div n1").alias("p_ppm"),
                F.expr(f"(c2 * {MICRO}) div n2").alias("q_ppm"),
                F.when(F.col("c1") > 0, F.round(lr1 * MICRO).cast("long"))
                .otherwise(F.lit(0))
                .alias("_lr1"),
                F.when(F.col("c2") > 0, F.round(lr2 * MICRO).cast("long"))
                .otherwise(F.lit(0))
                .alias("_lr2"),
            )
            .select(
                "term",
                "c_ref",
                "c_cur",
                "p_ppm",
                "q_ppm",
                F.expr(f"(p_ppm * _lr1 + q_ppm * _lr2) div (2 * {MICRO})").alias(
                    "jsd_contrib_micro"
                ),
            )
            .orderBy(F.desc("jsd_contrib_micro"), "term")
        )


class StreamingCellDriftMonitor:
    """Embedding-distribution drift — the third drift modality next to the
    numeric (:class:`StreamingPsiMonitor`) and term
    (:class:`StreamingTermDriftMonitor`) monitors: PSI over the occupancy
    of a FIXED IVF cell partition of the embedding space. A shift in what
    the corpus is ABOUT shows up as probability mass moving between cells
    long before any single numeric feature drifts — and the monitor reuses
    the exact cell rule the ANN/dedup operators index by, so "cells that
    drifted" point directly at the affected index partitions.

    The reference histogram freezes at construction (K cells, one
    assignment pass over the reference corpus); live counts fold
    exactly-once per cell. State is O(K) forever. ``report()`` is the PSI
    decomposition over cells — (cell, n_ref, n_cur, p_ppm, q_ppm,
    lr_micro_nats, psi_contrib_micro), ordered by cell.
    """

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        ref: DataFrame,
        centroids: list[list[float]],
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        from observation_lakehouse_spark.operators.similarity import ivf_assign

        self.spark = spark
        self.centroids = [list(map(float, c)) for c in centroids]
        self.vec_col = vec_col
        self.id_col = id_col
        self.n_cells = len(centroids)
        self.ref_bins: list[tuple[int, int]] = sorted(
            (int(r["centroid_id"]), int(r["n"]))
            for r in ivf_assign(ref, self.centroids, id_col=id_col, vec_col=vec_col)
            .groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        self.n_ref_total = sum(n for _, n in self.ref_bins)
        if self.n_ref_total == 0:
            raise ValueError("reference corpus is empty — no drift yardstick")
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["cell"],
            key_types=["int"],
            aggs={"n_cur": ("count", "1")},
            agg_types={"n_cur": "bigint"},
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        from observation_lakehouse_spark.operators.similarity import ivf_assign

        assigned = ivf_assign(
            stream, self.centroids, id_col=self.id_col, vec_col=self.vec_col
        ).select(F.col("centroid_id").alias("cell"))
        return stream_mv_refresh(
            self.mv, assigned, checkpoint=checkpoint, available_now=available_now
        )

    def report(self) -> DataFrame:
        ref_df = self.spark.createDataFrame(
            self.ref_bins or [], "cell int, _nr bigint"
        )
        cur = self.mv.read().select("cell", F.col("n_cur").alias("_nc"))
        merged = (
            ref_df.join(cur, "cell", "full_outer")
            .select(
                "cell",
                F.coalesce("_nr", F.lit(0)).alias("n_ref"),
                F.coalesce("_nc", F.lit(0)).alias("n_cur"),
            )
        )
        total = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        k = self.n_cells
        wb = merged.withColumn("_NR", F.sum("n_ref").over(total)).withColumn(
            "_NC", F.sum("n_cur").over(total)
        )
        return (
            wb.select(
                "cell",
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
                "cell",
                "n_ref",
                "n_cur",
                "p_ppm",
                "q_ppm",
                "lr_micro_nats",
                F.expr(
                    f"((p_ppm - q_ppm) * lr_micro_nats) div {MICRO}"
                ).alias("psi_contrib_micro"),
            )
            .orderBy("cell")
        )


class StreamingChi2Monitor:
    """Continuous twin of :func:`~observation_lakehouse_spark.operators.
    audit.chi2_test` — categorical-mix drift, live (label/segment/source
    columns, where PSI's fixed numeric binning doesn't apply).

    The reference's category census is frozen at construction (NULLs
    excluded like the batch op; more than ``max_categories`` distinct
    values raises — an unbounded categorical is a vocabulary leak, fold it
    upstream). Live rows map any UNSEEN category into ``__other__`` so the
    maintained state stays O(categories) forever; counts fold exactly-once
    under the (checkpoint, batch_id) protocol. ``report()`` runs the SAME
    count-level math as the batch operator (audit.chi2_from_counts), so
    for the frozen category set the live report is bit-identical to
    ``chi2_test(ref, delivered-with-same-mapping)`` (pinned by
    tests/test_stream_drift.py).
    """

    OTHER = "__other__"

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        ref: DataFrame,
        cat_col: str = "category",
        max_categories: int = 1000,
    ) -> None:
        if max_categories < 1:
            raise ValueError("max_categories must be >= 1")
        self.spark = spark
        self.cat_col = cat_col
        counts = (
            ref.filter(F.col(cat_col).isNotNull())
            .groupBy(F.col(cat_col).cast("string").alias("category"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if len(counts) > max_categories:
            raise ValueError(
                f"reference has {len(counts)} categories > max_categories="
                f"{max_categories}; bucket the column upstream"
            )
        self.ref_counts: dict[str, int] = {
            r["category"]: int(r["n"]) for r in counts
        }
        self.cats: list[str] = sorted(self.ref_counts)
        self.mv = IncrementalAggregate(
            spark,
            location,
            keys=["category"],
            key_types=["string"],
            aggs={"n_cur": ("count", "1")},
            agg_types={"n_cur": "bigint"},
        )

    def _mapped(self, col) -> F.Column:
        c = col.cast("string")
        return F.when(c.isin(self.cats), c).otherwise(F.lit(self.OTHER))

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        rows = stream.filter(F.col(self.cat_col).isNotNull()).select(
            self._mapped(F.col(self.cat_col)).alias("category")
        )
        return stream_mv_refresh(
            self.mv, rows, checkpoint=checkpoint, available_now=available_now
        )

    def report(self) -> DataFrame:
        """chi2_test's exact per-category rows over (frozen reference,
        delivered stream): (category, n_ref, n_cur, ref_ppm, cur_ppm,
        contrib_micro, chi2_micro, df), ordered by category."""
        from observation_lakehouse_spark.operators.audit import chi2_from_counts

        ref_df = self.spark.createDataFrame(
            sorted(self.ref_counts.items()) or [], "category string, _nr bigint"
        )
        cur = self.mv.read().select("category", F.col("n_cur").alias("_nc"))
        merged = ref_df.join(cur, "category", "full_outer").select(
            "category",
            F.coalesce("_nr", F.lit(0)).alias("n_ref"),
            F.coalesce("_nc", F.lit(0)).alias("n_cur"),
        )
        return chi2_from_counts(merged)
