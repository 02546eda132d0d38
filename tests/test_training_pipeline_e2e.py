"""End-to-end training-data pipeline composition: the operators are verified
individually by oracles; this proves they CHAIN — clean → exact dedup →
near-dup cluster resolution (quality-canonical) → sequence packing → atomic
table with manifest-stats scans — with conservation invariants at each stage.
This is the flow a user of the engine actually runs over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from observation_lakehouse_spark.operators.dedup import (
    deduplicate,
    ngram_jaccard_pairs,
    release_cached,
)
from observation_lakehouse_spark.operators.graph import dedup_clusters
from observation_lakehouse_spark.operators.text import (
    clean_text,
    pack_sequences,
    quality_score,
)
from observation_lakehouse_spark.transaction import AtomicParquetTable

BOILER = "the quick brown fox jumps over the lazy dog again and again today"


def test_training_data_pipeline_end_to_end(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            # near-dup family: 1 is long/high-quality, 2 a short near-copy
            (1, BOILER + " with a genuinely informative and well formed tail sentence"),
            (2, BOILER + " with a tail"),
            # exact dup pair (3 survives, 30 drops)
            (3, "completely distinct content about spark execution plans here"),
            (30, "completely distinct content about spark execution plans here"),
            # singleton with messy whitespace the clean stage must normalize
            (4, "  another   unique\tdocument \n with odd   spacing  "),
        ],
        "doc_id long, text string",
    )

    # 1. normalize
    cleaned = clean_text(docs).select("doc_id", F.col("clean_text").alias("text"))

    # 2. exact dedup (lowest id wins)
    exact = deduplicate(cleaned)
    ids_after_exact = {r["doc_id"] for r in exact.select("doc_id").collect()}
    assert ids_after_exact == {1, 2, 3, 4}

    # 3. near-dup clusters + QUALITY-canonical keeper (the canonical_docs flow)
    pair_plan = ngram_jaccard_pairs(exact, threshold=0.5)
    pairs = pair_plan.select("id_a", "id_b")
    clusters = dedup_clusters(exact, pairs)
    scored = quality_score(exact).select("doc_id", "quality_score")
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    kept_ids = {
        r["doc_id"]
        for r in clusters.join(scored, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("doc_id")
        .collect()
    }
    # doc 1 (longer, higher quality) beats doc 2 inside the near-dup cluster
    assert kept_ids == {1, 3, 4}
    kept = exact.join(
        spark.createDataFrame([(i,) for i in sorted(kept_ids)], "doc_id long"),
        "doc_id",
    )

    # 4. pack into training sequences; stream mass == total kept tokens
    packed = pack_sequences(kept, "text", "doc_id", seq_len=16)
    rows = packed.collect()
    total_tokens = sum(r["n_tokens"] for r in rows)
    expect_tokens = (
        kept.select(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n"))
        .collect()[0]["n"]
    )
    assert total_tokens == expect_tokens
    # offsets are a gapless prefix sum in doc order
    running = 0
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        assert r["stream_offset"] == running
        running += r["n_tokens"]

    # 5. materialize into the atomic table; stats-scan prunes by offset range
    table = AtomicParquetTable(
        spark,
        str(tmp_path / "packed"),
        schema=_parse_datatype_string(
            "doc_id bigint, n_tokens bigint, stream_offset bigint, "
            "seq_id bigint, offset_in_seq bigint, spans_boundary boolean"
        ),
    )
    table.append(packed.select(
        "doc_id", "n_tokens", "stream_offset", "seq_id", "offset_in_seq",
        "spans_boundary",
    ))
    # read-your-writes + exact row parity
    assert table.read().count() == len(rows)
    # scan() on the packing offset returns exactly the mid-stream docs
    mid = table.scan("stream_offset", lower=1, upper=running - 1)
    assert {r["doc_id"] for r in mid.collect()} == {
        r["doc_id"] for r in rows if 1 <= r["stream_offset"] <= running - 1
    }

    release_cached(pair_plan)
    release_cached(packed)


def test_selection_pipeline_end_to_end(spark):
    """The round-6 SELECTION flow chains: DSIR target-likeness scoring →
    quality gating → token-budget cut → packing, with conservation
    invariants at each stage. Individual oracles prove each stage; this
    proves the HANDOFFS (column contracts, id preservation, budget math)."""
    from observation_lakehouse_spark.operators.selection import token_budget_select
    from observation_lakehouse_spark.operators.text import dsir_select, token_stats

    docs = spark.createDataFrame(
        [
            (i,
             ("the quick brown fox jumps over the lazy dog " * (1 + i % 3)).strip(),
             "en" if i % 3 == 0 else "fr",
             f"src{i % 2}",
             10)
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    # 1. DSIR: score every non-target doc, keep the 15 most target-like
    selected = dsir_select(docs, k=15)
    assert selected.count() == 15
    sel_ids = {r.doc_id for r in selected.collect()}
    target_ids = {r.doc_id for r in docs.filter("lang = 'en'").collect()}
    assert sel_ids.isdisjoint(target_ids)  # never selects the target set
    release_cached(selected)

    # 2. token stats on the selected slice (id handoff)
    slice_df = docs.join(
        spark.createDataFrame([(i,) for i in sorted(sel_ids)], "doc_id long"),
        "doc_id",
    )
    stats = token_stats(slice_df).select(
        "doc_id", "n_tokens", F.lit(0).alias("quality_micro")
    )

    # 3. budget cut: keep top docs whose token mass fits 60% of the total
    kept = token_budget_select(stats, budget_num=3, budget_den=5)
    total = stats.agg(F.sum("n_tokens")).collect()[0][0]
    kept_total = kept.agg(F.sum("n_tokens")).collect()[0][0] or 0
    assert kept_total <= (3 * total) // 5  # never exceeds the budget
    assert kept.count() > 0

    # 4. pack the survivors into fixed-length sequences; token conservation
    from observation_lakehouse_spark.operators.text import pack_sequences

    packed = pack_sequences(
        slice_df.join(kept.select("doc_id"), "doc_id"), "text", "doc_id", 32
    )
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == kept_total
