"""Spark 4 Python UDTF surface (SURVEY.md §2.10).

The reference's UDF surface is scalar (normalize_source / git_blob_hash,
arena.py:31-45) — the table-function slot of §2.10 has no reference
counterpart, so this module demonstrates the Spark-4-native UDTF path with
the engine's own chunking semantics and pins it AGAINST the relational
operator: ``ChunkTextUDTF`` must emit exactly the rows
``operators.text.chunk_documents`` derives with posexplode + slice
(tests/test_functions.py). That makes the UDTF a checked example of when
NOT to use one — the relational twin is whole-stage-codegen and
shuffle-free, while the UDTF crosses Arrow per row-batch; the UDTF form
exists for logic that genuinely cannot be expressed as column algebra
(stateful parsers, external-library tokenizers).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk_text string, n_chunk_tokens int")
class ChunkTextUDTF:
    """Lateral table function: fixed-size token windows of one document.

    Same contract as ``chunk_documents``: chunk k covers tokens
    [k*stride, k*stride + chunk_tokens); token-less input yields no rows;
    a trailing partial window is emitted. Register with
    ``spark.udtf.register("chunk_text", ChunkTextUDTF)`` and use in SQL as
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_text(d.text, 64, 64) c``.
    """

    def eval(self, text: str | None, chunk_tokens: int, stride: int):
        if text is None or chunk_tokens is None or chunk_tokens <= 0:
            return
        step = stride if stride and stride > 0 else chunk_tokens
        toks = text.split()
        if not toks:
            return
        chunk_id = 0
        for start in range(0, len(toks), step):
            piece = toks[start : start + chunk_tokens]
            yield chunk_id, " ".join(piece), len(piece)
            chunk_id += 1
