"""Source normalization + git-blob hashing (SURVEY.md §2.10 U1/U2).

The reference computes a git-style blob hash over normalized source code as the
deduplication identity for implementations and tests
(/root/reference/olake/ingest/arena.py:11-45): normalize newlines, rstrip each
line, trim trailing blank lines, then ``sha1(b"blob <len>\\0" + bytes)``.

The algorithm itself is public git plumbing (``git hash-object``). SHA-1 over an
arbitrarily-normalized string is not expressible with built-in Spark columns
(sha1 exists, but the length-prefixed header needs byte length of the normalized
text — that part IS expressible; the multi-step normalization is the awkward bit),
so the whole thing ships as ONE Arrow-batched pandas UDF: deterministic,
vectorized per batch, no per-row Python round trips. The reference's per-row
Arrow loop (arena.py:205-217) becomes a single column expression here.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def normalize_source(source: str) -> str:
    """Newline-normalize, per-line rstrip, trim trailing blank lines.

    Same contract as the reference's normalizer (arena.py:11-28) — shared by the
    hash UDF and by tests that need the normalized text itself.
    """
    lines = source.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    lines = [line.rstrip() for line in lines]
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


def git_blob_hash(source: str) -> str:
    """Git blob SHA-1 of the normalized source (arena.py:31-45 contract)."""
    data = normalize_source(source).encode("utf-8")
    return hashlib.sha1(b"blob %d\0" % len(data) + data).hexdigest()


@pandas_udf(StringType())
def git_blob_hash_udf(source: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) git blob hash; NULL in → NULL out."""
    return source.map(lambda s: None if s is None else git_blob_hash(s))


def code_hash_column(source: str | Column = "source_code") -> Column:
    """Convenience: the ``code_hash`` expression used by ingestion."""
    col = F.col(source) if isinstance(source, str) else source
    return git_blob_hash_udf(col)
