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
