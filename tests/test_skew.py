"""Salted two-phase aggregation + pipeline dedup + SRM accounting helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from observation_lakehouse_spark.functions.skew import salted_agg
from observation_lakehouse_spark.operators.dedup import deduplicate
from observation_lakehouse_spark.operators.srm import srm_output_view, srm_shape_stats


def test_salted_agg_matches_plain_agg(spark):
    # skewed: key 'hot' has 10k rows, others 10
    df = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("x")
    ).unionByName(
        spark.range(10).select(
            F.concat(F.lit("cold"), F.col("id")).alias("k"),
            F.col("id").cast("double").alias("x"),
        )
    )
    salted = {
        r["k"]: r
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", None), "total": ("sum", "x"), "hi": ("max", "x"),
             "lo": ("min", "x")},
            salt_buckets=8,
        ).collect()
    }
    plain = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("total"),
            F.max("x").alias("hi"), F.min("x").alias("lo"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        for c in ("n", "hi", "lo"):
            assert salted[k][c] == plain[k][c], (k, c)
        assert abs(salted[k]["total"] - plain[k]["total"]) < 1e-6


def test_salted_collect_set_and_content_stable_salt(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 3)], "k string, v int"
    )
    out = {
        r["k"]: sorted(r["vals"])
        for r in salted_agg(
            df, ["k"], {"vals": ("collect_set", "v")}, salt_buckets=4, salt_on="v"
        ).collect()
    }
    assert out == {"a": [1, 2], "b": [3]}


def test_salted_agg_rejects_non_mergeable():
    with pytest.raises(ValueError, match="avg"):
        salted_agg(None, ["k"], {"m": ("avg", "x")})


def test_deduplicate_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], "doc_id long, text string"
    )
    kept = deduplicate(df).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in kept] == [(1, "same"), (2, "other")]
    assert kept[0].asDict().keys() == {"doc_id", "text"}


def test_srm_shape_stats(observations):
    srm = srm_output_view(observations, problem_id="p_000", data_set_id="DSA")
    stats = srm_shape_stats(srm)
    assert stats == {
        "implementations": 10,
        "srm_rows": 40,
        "comparisons": 40 * 10 * 9 // 2,
    }


def test_default_salt_is_content_stable_under_repartition(spark):
    """The default salt hashes row content, so every result column — including
    the sorted merged collect_set — is identical under any input partitioning
    or ordering."""
    df = spark.range(2_000).select(
        F.concat(F.lit("k"), (F.col("id") % 3).cast("string")).alias("k"),
        (F.col("id") % 211).cast("double").alias("x"),
        (F.col("id") % 17).alias("tag"),
    )
    exprs = {
        "n": ("count", None),
        "total": ("sum", "x"),
        "hi": ("max", "x"),
        "tags": ("collect_set", "tag"),
    }

    def run(d):
        return sorted(
            (r["k"], r["n"], round(r["total"], 6), r["hi"], tuple(r["tags"]))
            for r in salted_agg(d, ["k"], exprs, salt_buckets=8).collect()
        )

    base = run(df)
    assert base == run(df.repartition(13))
    assert base == run(df.repartition(1))
    assert base == run(df.orderBy(F.desc("x")))


def test_salted_join_matches_plain_join(spark):
    from observation_lakehouse_spark.functions.skew import salted_join

    # hot key 1 dominates the big side
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1000), (3, 2000), (9, 1)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "warm"), (3, "cold")], "k long, label string")
    got = salted_join(big, small, on=["k"], salt=4).orderBy("k", "payload")
    want = big.join(small, "k").orderBy("k", "payload")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    # left join keeps unmatched big rows
    left = salted_join(big, small, on=["k"], salt=4, how="left")
    assert left.filter("k = 9 AND label IS NULL").count() == 1


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    from observation_lakehouse_spark.functions.skew import salted_join

    big = spark.createDataFrame([(1, i) for i in range(1000)], "k long, payload long")
    small = spark.createDataFrame([(1, "x")], "k long, label string")
    # distinct salt values actually used by the hot key > 1 → rows spread
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    assert salted.select("_salt").distinct().count() > 4
    assert salted_join(big, small, on=["k"], salt=8).count() == 1000


def test_salted_join_validates_args(spark):
    import pytest as _pytest

    from observation_lakehouse_spark.functions.skew import salted_join

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on=["k"], how="full")
    with _pytest.raises(ValueError, match="salt"):
        salted_join(df, df, on=["k"], salt=1)


def test_salted_join_preserves_user_salt_column(spark):
    """An input that already carries `_salt` keeps it in the output with its
    values intact (ADVICE r03: the helper column silently overwrote it)."""
    from observation_lakehouse_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, 10, 77), (1, 11, 88), (2, 20, 99)], "k long, payload long, _salt long"
    )
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k long, label string")
    got = salted_join(big, small, on=["k"], salt=4).orderBy("payload")
    assert "_salt" in got.columns
    assert [r["_salt"] for r in got.collect()] == [77, 88, 99]
    assert got.count() == 3


def test_skew_profile_ranks_hot_keys(spark):
    from observation_lakehouse_spark.functions.skew import skew_profile

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, "k", top_k=2).collect()
    assert [r["key"] for r in out] == ["hot", "warm"]
    assert out[0]["n_rows"] == 6 and out[0]["share"] == 0.5
    # 5 distinct keys, uniform would be 12/5: hot is 6/(12/5) = 2.5x
    assert out[0]["uniform_ratio"] == 2.5
    assert [r["rank"] for r in out] == [1, 2]


def _skewed(spark):
    # key 'hot' carries 5000 rows; 50 cold keys carry 10 each -> uniform_ratio
    # of 'hot' ~ 5000*51/5500 ~ 46x, far past the 5x rule
    return spark.range(5_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("x")
    ).unionByName(
        spark.range(500).select(
            F.concat(F.lit("cold"), (F.col("id") % 50)).alias("k"),
            F.col("id").cast("double").alias("x"),
        )
    )


def _uniform(spark):
    return spark.range(1_000).select(
        (F.col("id") % 20).cast("string").alias("k"),
        F.col("id").cast("double").alias("x"),
    )


def test_recommend_plan_flips_on_skew(spark):
    from observation_lakehouse_spark.functions.skew import recommend_plan

    hot = recommend_plan(_skewed(spark), "k")
    assert hot["strategy"] == "salted" and hot["hot_key"] == "hot"
    assert hot["hot_ratio"] >= hot["threshold"]
    flat = recommend_plan(_uniform(spark), "k")
    assert flat["strategy"] == "plain" and flat["hot_ratio"] < flat["threshold"]


def test_auto_agg_matches_plain_both_ways(spark):
    """The advisory picks the physical strategy; the VALUES must be identical
    on both paths (salted_agg's mergeable-algebra contract)."""
    from observation_lakehouse_spark.functions.skew import auto_agg

    exprs = {"n": ("count", None), "total": ("sum", "x"), "hi": ("max", "x")}
    for mk in (_skewed, _uniform):
        df = mk(spark)
        out = auto_agg(df, ["k"], exprs, salt_buckets=8)
        expect_salted = mk is _skewed
        assert (out._chosen_strategy["strategy"] == "salted") is expect_salted
        got = {r["k"]: (r["n"], round(r["total"], 6), r["hi"]) for r in out.collect()}
        plain = {
            r["k"]: (r["n"], round(r["total"], 6), r["hi"])
            for r in df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("total"),
                F.max("x").alias("hi"),
            ).collect()
        }
        assert got == plain
