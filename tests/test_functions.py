"""Unit tests: ordered aggregation idioms, git-blob hashing, text primitives."""

from __future__ import annotations

import hashlib
import subprocess

import duckdb
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.hashing import (
    git_blob_hash,
    git_blob_hash_udf,
    normalize_source,
)
from observation_lakehouse_spark.functions.ordered_agg import (
    ordered_string_agg,
    ordered_values,
)
from observation_lakehouse_spark.functions.text import (
    hashed_word_shingles,
    jaccard,
    rolling_fingerprint,
    tokens,
    word_shingles,
)


def test_ordered_string_agg_matches_duckdb(spark):
    """Differential: STRING_AGG(CASE WHEN ... ORDER BY x) on an awkward input —
    NULL values, all-NULL groups, shuffled physical order."""
    rows = [
        ("g1", 3, "c", "keep"), ("g1", 1, "a", "keep"), ("g1", 2, None, "keep"),
        ("g1", 4, "d", "drop"), ("g2", 1, None, "keep"), ("g2", 2, None, "keep"),
        ("g3", 2, "z", "drop"),
    ]
    df = spark.createDataFrame(rows, "g string, x int, v string, tag string")
    got = {
        r["g"]: r["agg"]
        for r in df.groupBy("g")
        .agg(ordered_string_agg("v", "x", ",", filter_cond=F.col("tag") == "keep").alias("agg"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x INT, v VARCHAR, tag VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    want = dict(
        con.execute(
            "SELECT g, STRING_AGG(CASE WHEN tag='keep' THEN v END, ',' ORDER BY x) FROM t GROUP BY g"
        ).fetchall()
    )
    assert got == want  # NULLs skipped; all-NULL group → NULL, not ''


def test_ordered_values_keeps_order_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, None)], "g int, x int, v string"
    )
    out = df.groupBy("g").agg(ordered_values("x", "v").alias("vals")).collect()[0]
    assert out["vals"] == ["a", None, "c"]


def test_git_blob_hash_is_git_compatible(tmp_path):
    """The hash must equal `git hash-object` on the normalized content."""
    src = "class A {\n  int x;   \n}\n\n\n"
    normalized = normalize_source(src)
    expected = hashlib.sha1(
        b"blob %d\0" % len(normalized.encode()) + normalized.encode()
    ).hexdigest()
    assert git_blob_hash(src) == expected
    try:
        f = tmp_path / "blob.txt"
        f.write_text(normalized)
        git_out = subprocess.run(
            ["git", "hash-object", str(f)], capture_output=True, text=True, check=True
        ).stdout.strip()
        assert git_blob_hash(src) == git_out
    except (FileNotFoundError, subprocess.CalledProcessError):
        pass  # git not installed — the hashlib derivation above already checks


def test_git_blob_hash_udf_vectorized(spark):
    df = spark.createDataFrame([("a\n",), (None,), ("b",)], "src string")
    got = [r["h"] for r in df.select(git_blob_hash_udf("src").alias("h")).collect()]
    assert got == [git_blob_hash("a\n"), None, git_blob_hash("b")]


def test_normalize_source():
    assert normalize_source("a\r\nb\r") == "a\nb"
    assert normalize_source("a   \nb\n\n\n") == "a\nb"
    assert normalize_source("") == ""


def test_word_shingles_and_jaccard(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps",), ("xy",), ("",)], "text string"
    )
    out = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert out[0]["sh"] == ["the quick brown", "quick brown fox", "brown fox jumps"]
    assert out[1]["sh"] == ["xy"]  # shorter than window → whole doc
    assert out[2]["sh"] == []
    j = (
        spark.range(1)
        .select(
            jaccard(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                F.array(F.lit("b"), F.lit("c"), F.lit("d")),
            ).alias("j")
        )
        .collect()[0]["j"]
    )
    assert abs(j - 0.5) < 1e-9


def test_hashed_word_shingles_matches_string_shingles(spark):
    """Hashed shingle count per doc == string shingle count (set semantics)."""
    df = spark.createDataFrame(
        [("a b c d e",), ("a b c a b c",), ("one two",), ("",)], "text string"
    )
    out = df.select(
        F.size(word_shingles("text", 3)).alias("n_str"),
        F.size(hashed_word_shingles("text", 3)).alias("n_hash"),
    ).collect()
    for r in out:
        assert r["n_str"] == r["n_hash"]


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b c",)], "text string")
    vals = [
        r["fp"] for r in df.select(rolling_fingerprint(tokens("text")).alias("fp")).collect()
    ]
    assert vals[0] == vals[2]
    assert vals[0] != vals[1]


def test_tokens_edge_cases(spark):
    df = spark.createDataFrame([("  a  b ",), ("",), ("   ",)], "text string")
    out = [r["t"] for r in df.select(tokens("text").alias("t")).collect()]
    assert out == [["a", "b"], [], []]


def test_parallelize_scan_only_fans_out_narrow_inputs(spark):
    from observation_lakehouse_spark.functions.partitioning import parallelize_scan

    narrow = spark.range(100).coalesce(1)
    wide = spark.range(100).repartition(spark.sparkContext.defaultParallelism)
    assert (
        parallelize_scan(narrow).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # already-parallel input passes through untouched (no extra shuffle)
    assert parallelize_scan(wide) is wide


def test_word_shingle_xxhashes_matches_hashed_word_shingles_identity(spark):
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.functions.text import (
        word_shingle_xxhashes,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b"), (2, ""), (3, "x y z x y z x y")],
        "doc_id long, text string",
    )
    direct = df.select(
        "doc_id", F.array_sort(word_shingle_xxhashes("text", 3)).alias("h")
    ).collect()
    via_strings = df.select(
        "doc_id",
        F.array_sort(
            F.transform(word_shingles("text", 3), lambda s: F.xxhash64(s))
        ).alias("h"),
    ).collect()
    assert {r["doc_id"]: r["h"] for r in direct} == {
        r["doc_id"]: r["h"] for r in via_strings
    }


def test_vocab_coverage_flags_oov_tokens(spark):
    from observation_lakehouse_spark.operators.text import vocab_coverage

    rows = [
        (1, "aa aa aa bb"),   # aa x3, bb x1
        (2, "aa bb cc"),      # cc is rare
        (3, "cc cc dd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # vocab of size 2 = {aa (4), cc (3)}; bb (2) and dd (1) are OOV
    out = {r["doc_id"]: r for r in vocab_coverage(df, vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[2]["n_oov"] == 1  # bb
    assert out[3]["n_oov"] == 1  # dd
    assert out[3]["oov_ratio"] == round(1 / 3, 6)
    # ties at the boundary are broken (count desc, token asc) -> deterministic
    out_k3 = {r["doc_id"]: r for r in vocab_coverage(df, vocab_size=3).collect()}
    assert out_k3[1]["n_oov"] == 0  # bb now in vocab (beats dd by count)


def test_bpe_train_merges_classic_fixture(spark):
    """Hand-computed BPE on the Sennrich-style fixture: weighted pair counts,
    (count DESC, left, right) tie-break, and leftmost-greedy overlap inside
    an 'aaaa' run (3 adjacent pairs, merges apply at offsets 0 and 2)."""
    from observation_lakehouse_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame(
        [("low low low lower lower newest newest newest newest widest",),
         ("aaaa aaaa ab",)],
        "text string",
    )
    got = [tuple(r) for r in bpe_train_merges(df, n_merges=6).collect()]
    assert got == [
        (1, "a", "a", "aa", 6),    # 2 x 'aaaa': 3 overlapping pairs each
        (2, "w", "e", "we", 6),    # newest x4 + lower x2
        (3, "l", "o", "lo", 5),    # low x3 + lower x2
        (4, "s", "t", "st", 5),    # newest x4 + widest
        (5, "e", "we", "ewe", 4),  # n-e-we-st x4
        (6, "ewe", "st", "ewest", 4),
    ]


def test_bpe_train_stops_when_no_pairs_remain(spark):
    from observation_lakehouse_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([("ab ab",)], "text string")
    got = [tuple(r) for r in bpe_train_merges(df, n_merges=5).collect()]
    assert got == [(1, "a", "b", "ab", 2)]  # then every word is one symbol


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from observation_lakehouse_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(1, "newest lowest"), (2, "we we st")], "doc_id long, text string"
    )
    # merges: w+e, s+t, then e+we is inert here; newest -> n,e,we,st (4 pieces)
    # lowest -> l,o,we,st (4); 'we' -> we (1); 'st' -> st (1)
    out = {r["doc_id"]: r for r in bpe_encode(df, [("w", "e"), ("s", "t")]).collect()}
    assert out[1]["n_words"] == 2 and out[1]["n_pieces"] == 8
    assert out[1]["n_chars_tokenized"] == 12  # chars survive merging intact
    assert out[2]["n_pieces"] == 3 and out[2]["pieces_per_word"] == 1.0


def test_chunk_udtf_matches_relational_chunker(spark):
    """SURVEY §2.10's table-function slot: the Python UDTF must emit exactly
    the rows the codegen relational twin derives — including the trailing
    partial window and the no-token case."""
    from observation_lakehouse_spark.functions.udtf import ChunkTextUDTF
    from observation_lakehouse_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "one two"),
            (3, "   "),
            (4, None),
        ],
        "doc_id long, text string",
    )
    spark.udtf.register("chunk_text", ChunkTextUDTF)
    docs.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM udtf_docs d, "
            "LATERAL chunk_text(d.text, 3, 3) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, chunk_tokens=3).collect()
    }
    assert got == want and len(got) == 4  # 3 chunks for doc 1, 1 for doc 2
