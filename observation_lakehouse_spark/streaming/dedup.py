"""Streaming deduplication: continuous exact-dedup admission for a document
stream — the Structured-Streaming twin of
:func:`~observation_lakehouse_spark.operators.dedup.incremental_dedup`.

``dropDuplicatesWithinWatermark`` keys state on the 32-byte content digest,
NOT the document text: state stores one digest + timestamp per distinct
document seen inside the watermark horizon, so memory is O(distinct recent
docs × 40 bytes) regardless of document size. The watermark bounds state
(a duplicate arriving later than the horizon is admitted again — the
standard trade; an unbounded ``dropDuplicates`` would grow state forever,
which is exactly what a 100 TB continuous pipeline cannot do). Cross-run
admission against the standing corpus composes downstream: this stage
removes intra-stream duplicates, the batch anti-join against the persisted
hash index (incremental_dedup) removes corpus hits at materialization time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-dedup a document stream on content digest within a watermark.

    Input must be a streaming DataFrame with an event-time column; output
    carries the original columns plus ``content_hash``. Duplicate = same
    sha256(text) within the watermark horizon; the first arrival wins.
    """
    hashed = stream.withColumn("content_hash", F.sha2(F.col(text_col), 256))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def near_dedup_admit_stream(
    stream: DataFrame,
    corpus: DataFrame,
    table,
    checkpoint: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    available_now: bool = False,
    **lsh_kwargs,
):
    """Continuous NEAR-dup admission — the streaming twin of
    :func:`~observation_lakehouse_spark.operators.dedup.minhash_lsh_admit`.

    Each micro-batch is admitted against the standing corpus = the static
    ``corpus`` PLUS everything this stream already admitted into ``table``
    (an :class:`~observation_lakehouse_spark.transaction.AtomicParquetTable`
    — its snapshot read makes admission read-your-writes across batches, so
    a near-dup of a doc admitted two batches ago is rejected). Within a
    batch, near-dup pairs resolve lowest-id-wins first (the same rule as
    :func:`~..operators.dedup.deduplicate`), then survivors face the corpus.

    Exactly-once: the admitted-rows append commits under a (checkpoint,
    batch_id) idempotency key in the same atomic manifest publish — a
    replayed batch is recognized and skipped, so no duplicate admissions
    (the same argument as streaming/mv_refresh.py; replay here would be
    worse than duplicate rows, it would seed the corpus with copies that
    then reject legitimate future documents' near-dup verdicts... of
    themselves).

    At scale the per-batch cost is the LSH bucket join of batch x standing
    corpus (production keeps the corpus side as a maintained signature
    table); batch-internal resolution is pair-count-bounded by bucket
    occupancy, never batch².
    """
    import uuid as _uuid

    from observation_lakehouse_spark.operators.dedup import (
        minhash_lsh_admit,
        minhash_lsh_dedup,
        release_cached,
    )

    ckpt = checkpoint or f"/tmp/near_dedup_ckpt_{_uuid.uuid4().hex}"
    ckpt_id = _uuid.uuid5(_uuid.NAMESPACE_URL, ckpt).hex

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            # intra-batch: drop any doc near-dup'ing a smaller-id batch doc
            pairs = minhash_lsh_dedup(
                batch_df, text_col, id_col, threshold=threshold, **lsh_kwargs
            )
            # anti-join, not a collect: the loser set is data-sized
            survivors = batch_df.join(
                pairs.select(F.col("id_b").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
            standing = corpus.select(id_col, text_col).unionByName(
                table.read().select(id_col, text_col)
            )
            verdict = minhash_lsh_admit(
                survivors, standing, text_col, id_col, threshold=threshold, **lsh_kwargs
            )
            admitted_ids = verdict.filter(F.col("admitted")).select(
                F.col("doc_id").alias("_adm_id")
            )
            admitted = survivors.join(
                admitted_ids, survivors[id_col] == F.col("_adm_id"), "semi"
            )
            table.append(admitted, idempotency_key=f"neardedup:{ckpt_id}:{batch_id}")
            release_cached(verdict)
            release_cached(pairs)
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(admit).option("checkpointLocation", ckpt)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def remove_dup_spans_stream(
    stream: DataFrame,
    gram_table,
    out_table,
    checkpoint: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
    available_now: bool = False,
):
    """Continuous duplicated-span REMOVAL — the streaming twin of
    :func:`~observation_lakehouse_spark.operators.dedup.remove_dup_spans`
    (the cleaning half of ExactSubstr, Lee et al. 2021), completing the
    streaming cleaning surface next to exact (:func:`dedup_stream`) and
    near-dup (:func:`near_dedup_admit_stream`) admission.

    Each micro-batch computes its positional ``ngram``-token window hashes
    (the SAME ``span_grams`` expressions the batch operator uses), then a
    window is *duplicated* when its occurrences in THIS batch plus the
    standing gram-count table reach 2 — so both within-batch repetition and
    boilerplate already seen by earlier batches are cut. Covered tokens are
    removed, the cleaned docs append to ``out_table`` and the batch's gram
    counts append to ``gram_table`` (read-your-writes through the atomic
    snapshot: batch N+1 sees batch N's grams).

    Admission-time semantics, stated trade: a doc is cleaned against the
    corpus PREFIX seen so far — a later duplicate cleans itself but does not
    retro-clean the earlier occurrence (retro-cleaning is the batch
    operator's job at materialization time). Consequently ONE batch over an
    empty standing table is exactly the batch operator — the batch-twin
    agreement tests/test_stream_span_removal.py pins.

    Exactly-once: both appends commit under (checkpoint, batch_id)
    idempotency keys, so a replayed batch re-commits neither cleaned rows
    nor gram counts (a gram double-count would silently turn unique text
    into "duplicated" spans for every later batch — worse than duplicate
    rows). A crash between the two appends replays safely: the committed
    append is recognized and skipped, the missing one commits.

    At 100 TB the standing state is the gram-count table — O(distinct grams)
    8-byte keys with map-side-combined maintenance (production compacts it
    periodically by re-aggregating; the read path SUMs per gram either way),
    and the per-batch cost is batch-token-linear plus one join against it.
    Nothing is pair-quadratic: a hot gram costs its occurrence count.
    """
    import uuid as _uuid

    from observation_lakehouse_spark.operators.dedup import (
        covered_positions,
        rebuild_clean_text,
        span_grams,
    )

    ckpt = checkpoint or f"/tmp/span_removal_ckpt_{_uuid.uuid4().hex}"
    ckpt_id = _uuid.uuid5(_uuid.NAMESPACE_URL, ckpt).hex

    def clean(batch_df: DataFrame, batch_id: int) -> None:
        base, g = span_grams(batch_df, text_col, id_col, ngram)
        try:
            batch_counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
            standing = gram_table.read().groupBy("gram").agg(
                F.sum("n").alias("n_prior")
            )
            dup_grams = (
                batch_counts.join(standing, "gram", "left")
                .filter(
                    F.col("n") + F.coalesce(F.col("n_prior"), F.lit(0)) >= 2
                )
                .select("gram")
            )
            cov = covered_positions(g, dup_grams, ngram)
            cleaned = rebuild_clean_text(base, cov)
            out_table.append(
                cleaned, idempotency_key=f"spanclean:{ckpt_id}:{batch_id}"
            )
            gram_table.append(
                batch_counts, idempotency_key=f"spangrams:{ckpt_id}:{batch_id}"
            )
        finally:
            # blocking: async unpersist leaves columnar blocks resident while
            # the next batch allocates (the repo's standing 1g-session rule)
            g.unpersist(True)
            base.unpersist(True)

    writer = stream.writeStream.foreachBatch(clean).option("checkpointLocation", ckpt)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
