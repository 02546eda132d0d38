"""Streaming drop-admission pipeline — the end-to-end composition of the
engine's curation gates over ONE document stream (r8 judge #8).

A training-data ingest wants every arriving drop pushed through the same
gauntlet the batch pipeline applies, continuously and exactly-once:

1. **Drift gate (batch-level)**: the batch's distribution of a declared
   per-doc metric is PSI-scored against a FROZEN reference histogram (the
   :class:`~observation_lakehouse_spark.streaming.drift.StreamingPsiMonitor`
   yardstick discipline). A drifted batch is QUARANTINED WHOLE — drift is a
   property of the batch's source, not of individual rows; admitting its
   "good-looking" rows would still shift the corpus mixture, and the
   quarantine table preserves everything for triage/backfill.
2. **Quality gate (row-level)**: docs below a quality-score floor
   (:func:`~observation_lakehouse_spark.operators.text.quality_score`) drop.
3. **Near-dup admission (row-level)**: survivors face banded MinHash-LSH
   against the standing corpus = the static seed PLUS everything this
   pipeline already admitted (snapshot read of the admitted table makes the
   check read-your-writes across batches), with intra-batch lowest-id-wins
   resolution first — the
   :func:`~observation_lakehouse_spark.streaming.dedup.near_dedup_admit_stream`
   semantics.
4. **Token accounting**: admitted tokens accumulate in an exact counter;
   once a declared budget is reached, later batches quarantine instead of
   admitting (a training-mix budget is a hard corpus property — silently
   dropping the overflow would hide it from the mixture planner).

Exactly-once: the admitted append, the quarantine append and the admission
LOG row all commit under (checkpoint, batch_id) idempotency keys inside
:class:`~observation_lakehouse_spark.transaction.AtomicParquetTable`'s
atomic manifest publish — a replayed micro-batch is recognized and skipped
in each table independently, so replay can't double-admit, double-count
tokens, or double-log (the streaming/mv_refresh.py argument).

Scale shape per batch: the PSI gate is one K-bin aggregate collected as K
rows; quality is a row-local projection; the LSH admission joins batch ×
standing corpus through band keys only; the log is one row. Nothing scans
the standing corpus outside the bucket join.
"""

from __future__ import annotations

import math
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from observation_lakehouse_spark.operators.audit import MICRO

_LOG_SCHEMA = (
    "batch_id long, n_in long, psi_micro long, quarantined boolean, "
    "quarantine_reason string, n_quality_rejected long, n_dup_rejected long, "
    "n_admitted long, tokens_admitted long"
)


class StreamingAdmissionPipeline:
    """One input stream → admitted table + quarantine table + admission log.

    ``ref`` freezes the drift yardstick at construction (K bins over
    ``[lo, hi)`` of ``drift_expr``, a per-doc SQL expression). ``corpus``
    seeds the near-dup standing set. ``psi_gate_micro`` is the batch PSI
    ceiling in micro-nats (the industry 0.25 "shifted" line = 250_000);
    ``min_quality`` the row floor on quality_score; ``token_budget`` the
    cumulative whitespace-token budget (None = unlimited).
    """

    def __init__(
        self,
        spark: SparkSession,
        admitted_table,
        quarantine_table,
        log_table,
        corpus: DataFrame,
        ref: DataFrame,
        drift_expr: str = "LEAST(length(text) / 1000.0, 1.0)",
        lo: float = 0.0,
        hi: float = 1.0,
        n_bins: int = 10,
        psi_gate_micro: int = 250_000,
        min_batch_for_drift: int | None = None,
        min_quality: float = 0.5,
        token_budget: int | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.5,
        classifier_weights: DataFrame | None = None,
        min_classifier_micro: int = 500_000,
        **lsh_kwargs,
    ) -> None:
        if n_bins < 1 or not hi > lo:
            raise ValueError("need n_bins >= 1 and hi > lo")
        self.spark = spark
        self.admitted = admitted_table
        self.quarantine = quarantine_table
        self.log = log_table
        self.corpus = corpus
        self.drift_expr = drift_expr
        self.n_bins = int(n_bins)
        self.lo_u = int(round(lo * MICRO))
        self.hi_u = int(round(hi * MICRO))
        self.span = max(1, (self.hi_u - self.lo_u) // self.n_bins)
        self.psi_gate_micro = int(psi_gate_micro)
        # PSI on a handful of rows is add-one-smoothing noise, not signal —
        # a 1-doc batch "drifts" against ANY reference. Batches below this
        # floor skip the batch-level gate (their rows still face the
        # row-level quality and dedup gates); default: one row per bin.
        self.min_batch_for_drift = (
            self.n_bins if min_batch_for_drift is None else int(min_batch_for_drift)
        )
        self.min_quality = float(min_quality)
        self.token_budget = None if token_budget is None else int(token_budget)
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.lsh_kwargs = lsh_kwargs
        # r11: optional TRAINED quality gate (operators/classifier.py) next
        # to the heuristic floor — the fastText-style shape where a frozen
        # trained linear model scores every arriving doc. The weight table
        # is collected ONCE here (<= n_buckets + intercept rows; the same
        # frozen-yardstick discipline as ref_bins) and replayed per batch
        # as a broadcast literal table. Rows must clear BOTH gates.
        self.classifier_w: list[tuple[int, int]] | None = None
        self.min_classifier_micro = int(min_classifier_micro)
        if classifier_weights is not None:
            self.classifier_w = [
                (int(r["b"]), int(r["w_micro"]))
                for r in classifier_weights.select("b", "w_micro").collect()
            ]
            if not self.classifier_w:
                raise ValueError("classifier_weights is empty — train first")
        # freeze the reference histogram NOW (K rows collected once): the
        # monitor's whole point is a fixed yardstick
        self.ref_bins: dict[int, int] = {
            int(r["bin"]): int(r["n"])
            for r in ref.select(self._bin_expr().alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        self.n_ref_total = sum(self.ref_bins.values())
        if self.n_ref_total == 0:
            raise ValueError("reference corpus is empty — no drift yardstick")

    def _bin_expr(self):
        v_micro = (F.expr(self.drift_expr).cast("decimal(18,6)") * MICRO).cast("long")
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

    def _batch_psi_micro(self, batch_df: DataFrame) -> int:
        """Add-one-smoothed PSI of the batch vs the frozen reference, exact
        micro-nats (the operators/audit.psi_drift decomposition, evaluated
        driver-side on 2·K bounded integers)."""
        cur = {
            int(r["bin"]): int(r["n"])
            for r in batch_df.select(self._bin_expr().alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_cur = sum(cur.values())
        k = self.n_bins
        psi = 0
        for b in range(k):
            nr, nc = self.ref_bins.get(b, 0), cur.get(b, 0)
            p_ppm = ((nr + 1) * MICRO) // (self.n_ref_total + k)
            q_ppm = ((nc + 1) * MICRO) // (n_cur + k)
            lr = round(
                math.log(((nr + 1) * (n_cur + k)) / ((nc + 1) * (self.n_ref_total + k)))
                * MICRO
            )
            psi += ((p_ppm - q_ppm) * lr) // MICRO
        return psi

    def tokens_admitted(self) -> int:
        rows = self.log.read().agg(
            F.sum("tokens_admitted").alias("t")
        ).collect()
        return int(rows[0]["t"] or 0)

    def start(
        self,
        stream: DataFrame,
        checkpoint: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        from observation_lakehouse_spark.operators.dedup import (
            minhash_lsh_admit,
            minhash_lsh_dedup,
            release_cached,
        )
        from observation_lakehouse_spark.operators.text import quality_score

        ckpt = checkpoint or f"/tmp/admission_ckpt_{_uuid.uuid4().hex}"
        ckpt_id = _uuid.uuid5(_uuid.NAMESPACE_URL, ckpt).hex
        id_col, text_col = self.id_col, self.text_col

        def _log(batch_id: int, **kw) -> None:
            row = {
                "batch_id": batch_id,
                "n_in": 0,
                "psi_micro": 0,
                "quarantined": False,
                "quarantine_reason": None,
                "n_quality_rejected": 0,
                "n_dup_rejected": 0,
                "n_admitted": 0,
                "tokens_admitted": 0,
            }
            row.update(kw)
            self.log.append(
                self.spark.createDataFrame(
                    [tuple(row[f.split()[0]] for f in _LOG_SCHEMA.split(", "))],
                    _LOG_SCHEMA,
                ),
                idempotency_key=f"admlog:{ckpt_id}:{batch_id}",
            )

        def admit(batch_df: DataFrame, batch_id: int) -> None:
            batch_df = batch_df.persist()
            try:
                n_in = batch_df.count()
                if n_in == 0:
                    _log(batch_id)
                    return
                psi = (
                    self._batch_psi_micro(batch_df)
                    if n_in >= self.min_batch_for_drift
                    else 0
                )
                budget_spent = self.tokens_admitted()
                if psi > self.psi_gate_micro or (
                    self.token_budget is not None
                    and budget_spent >= self.token_budget
                ):
                    reason = (
                        "psi_drift" if psi > self.psi_gate_micro else "token_budget"
                    )
                    self.quarantine.append(
                        batch_df,
                        idempotency_key=f"admq:{ckpt_id}:{batch_id}",
                    )
                    _log(
                        batch_id,
                        n_in=n_in,
                        psi_micro=psi,
                        quarantined=True,
                        quarantine_reason=reason,
                    )
                    return
                # row-level quality floor
                good = (
                    quality_score(
                        batch_df.select(
                            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
                        ),
                        "text",
                    )
                    .filter(F.col("quality_score") >= self.min_quality)
                    .select("doc_id")
                )
                if self.classifier_w is not None:
                    from observation_lakehouse_spark.operators.classifier import (
                        hashed_token_features,
                        logreg_score,
                    )

                    docs = batch_df.select(
                        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
                    )
                    wdf = self.spark.createDataFrame(
                        self.classifier_w, "b int, w_micro long"
                    )
                    clf_good = logreg_score(
                        hashed_token_features(docs),
                        docs.select(F.col("doc_id").alias("id")),
                        wdf,
                    ).filter(
                        F.col("score_micro") >= self.min_classifier_micro
                    ).select(F.col("id").alias("doc_id"))
                    good = good.join(clf_good, "doc_id", "semi")
                passed = batch_df.join(
                    good, batch_df[id_col] == good["doc_id"], "semi"
                ).persist()
                n_passed = passed.count()
                # intra-batch near-dup resolution (lowest id wins), then the
                # standing-corpus admission — read-your-writes via snapshot
                pairs = minhash_lsh_dedup(
                    passed, text_col, id_col,
                    threshold=self.threshold, **self.lsh_kwargs,
                )
                survivors = passed.join(
                    pairs.select(F.col("id_b").alias(id_col)).distinct(),
                    id_col,
                    "left_anti",
                )
                standing = self.corpus.select(id_col, text_col).unionByName(
                    self.admitted.read().select(id_col, text_col)
                )
                verdict = minhash_lsh_admit(
                    survivors, standing, text_col, id_col,
                    threshold=self.threshold, **self.lsh_kwargs,
                )
                admitted_ids = verdict.filter(F.col("admitted")).select(
                    F.col("doc_id").alias("_adm_id")
                )
                admitted = survivors.join(
                    admitted_ids, survivors[id_col] == F.col("_adm_id"), "semi"
                ).persist()
                stats = admitted.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+"))).alias(
                        "toks"
                    ),
                ).collect()[0]
                n_admitted = int(stats["n"] or 0)
                self.admitted.append(
                    admitted, idempotency_key=f"admok:{ckpt_id}:{batch_id}"
                )
                _log(
                    batch_id,
                    n_in=n_in,
                    psi_micro=psi,
                    n_quality_rejected=n_in - n_passed,
                    n_dup_rejected=n_passed - n_admitted,
                    n_admitted=n_admitted,
                    tokens_admitted=int(stats["toks"] or 0),
                )
                release_cached(verdict)
                release_cached(pairs)
                admitted.unpersist()
                passed.unpersist()
            finally:
                batch_df.unpersist()

        writer = stream.writeStream.foreachBatch(admit).option(
            "checkpointLocation", ckpt
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
