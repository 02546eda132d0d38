"""Market-basket mining: association rules over co-purchased items.

The classic Agrawal–Srikant (VLDB'94) support / confidence / lift layer on
top of the pair census ``part_cooccurrence`` already computes — the step
that turns "these items co-occur" into "customers who bought A buy B at
3.2x the base rate".

Determinism: every metric is an exact integer parts-per-million ratio —
support_ppm = n_ab*1e6 DIV n_baskets, confidence = n_ab*1e6 DIV n_a,
lift = n_ab*n_baskets*1e6 DIV (n_a*n_b) — so rankings are engine- and
partitioning-independent with a total (lift DESC, a, b) tie-break.

Scale shape: one distinct (basket, item) projection; per-item basket counts
are an |items|-bounded aggregate broadcast back to the pair census (items
are a catalog, baskets are the fact — the broadcast side is the bounded
one); the pair census itself is the basket self-join whose pair mass grows
with basket size, not corpus size (the part_cooccurrence scaling argument,
SCALE_PROBE alpha 0.20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_pair_support: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k item pairs by lift among pairs co-occurring in at least
    ``min_pair_support`` baskets. Output (item_a, item_b, n_ab, support_ppm,
    confidence_a_to_b_ppm, lift_ppm), item_a < item_b, ordered by
    (lift_ppm DESC, item_a, item_b)."""
    bi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    # persist: the (basket, item) projection feeds the pair self-join AND
    # the per-item counts AND the basket total.
    bi = bi.persist()
    n_baskets = bi.select("b").distinct().count()
    item_n = bi.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_support)
    )
    out = (
        pairs.join(
            F.broadcast(item_n.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.expr(f"(n_ab * {MICRO}) DIV {n_baskets}").alias("support_ppm"),
            F.expr(f"(n_ab * {MICRO}) DIV n_a").alias("confidence_a_to_b_ppm"),
            F.expr(f"(n_ab * CAST({n_baskets} AS BIGINT) * {MICRO}) DIV (n_a * n_b)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("lift_ppm"), "item_a", "item_b")
        .limit(k)
    )
    out._cached_deps = (bi,)  # type: ignore[attr-defined]  # noqa: SLF001
    return out


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks,
    CL'90) over ADJACENT word pairs — the classic phrase detector a
    training-data pipeline runs before tokenizer/vocab decisions ("new
    york" is one unit; "of the" is not, despite a far higher raw count).

    ``PMI(a,b) = ln( P(ab) / (P(a)·P(b)) )`` with ``P(ab) = c_ab/N_pairs``
    and unigram probabilities over the token stream. Determinism: the log
    argument is assembled as ONE exact integer ratio —
    ``(c_ab·N_tok²) / (N_pairs·c_a·c_b)`` cast to double for a single
    correctly-rounded quotient — then rounded to integer MICRO-NATS (the
    dsir/xent discipline: identical integer inputs → identical IEEE
    quotient → identical log bits in practice, with the ranking argument
    the TF-IDF docstring makes). ``min_count`` suppresses the
    low-frequency PMI pathology (hapax pairs score arbitrarily high).

    Scale shape: one posexplode + per-doc lead window (doc-partitioned,
    never corpus-wide) → one pair hash aggregate + one unigram hash
    aggregate (both map-side combinable, vocabulary-bounded outputs) →
    broadcast unigram counts onto the pair table → distributed top-k
    (TakeOrderedAndProject). Numerator/denominator products stay inside
    int64 for corpora to ~1e9 tokens per the bound in the expression
    comment; beyond that the cast to double happens per factor first.

    Returns (word_a, word_b, pair_count, pmi_micro_nats), top-``k`` by
    (pmi DESC, a ASC, b ASC).
    """
    from pyspark.sql import Window

    from observation_lakehouse_spark.functions.partitioning import parallelize_scan
    from observation_lakehouse_spark.functions.text import lower_tokens

    tok = (
        parallelize_scan(df)
        .select(F.col(id_col).alias("_d"), F.posexplode(lower_tokens(text_col)).alias("pos", "w"))
    )
    w_doc = Window.partitionBy("_d").orderBy("pos")
    pairs = (
        tok.withColumn("nxt", F.lead("w").over(w_doc))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("w").alias("word_a"), F.col("nxt").alias("word_b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_count))
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = tok.agg(
        F.count(F.lit(1)).alias("n_tok"),
        # pairs per doc = tokens - 1; distinct doc count folds in one pass
        (F.count(F.lit(1)) - F.countDistinct("_d")).alias("n_pairs"),
    )
    scored = (
        pairs.join(F.broadcast(uni.withColumnRenamed("w", "word_a").withColumnRenamed("c", "c_a")), "word_a")
        .join(F.broadcast(uni.withColumnRenamed("w", "word_b").withColumnRenamed("c", "c_b")), "word_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "word_a",
            "word_b",
            "pair_count",
            # one integer ratio -> one double quotient -> one log. int64
            # bound: c_ab*n_tok^2 <= n_tok^3; exact while n_tok < ~2e6 —
            # fine for the registered corpus; at larger corpora the
            # products exceed 2^63, so they are assembled in DECIMAL(38,0)
            # (exact to 1e38) and THEN cast, keeping the quotient identical.
            F.round(
                F.log(
                    F.expr(
                        "CAST(CAST(pair_count AS DECIMAL(38,0)) * n_tok * n_tok AS DOUBLE)"
                    )
                    / F.expr(
                        "CAST(CAST(n_pairs AS DECIMAL(38,0)) * c_a * c_b AS DOUBLE)"
                    )
                )
                * 1_000_000.0
            )
            .cast("long")
            .alias("pmi_micro_nats"),
        )
        .orderBy(F.desc("pmi_micro_nats"), "word_a", "word_b")
        .limit(int(k))
    )
    return scored


def mutual_information(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Plug-in mutual information between two categorical columns — the
    feature-relevance / redundancy score (MI = expected PMI over the joint):
    ``MI = Σ_ab P(ab)·ln( P(ab) / (P(a)P(b)) )`` in exact integer micro-nat
    decomposition per observed cell, so the whole table is oracle-checkable
    and the MI is the shared sum column.

    Determinism (the pmi_collocations discipline): each cell's log argument
    is ONE double quotient assembled from exact BIGINT counts (per-factor
    double casts, no integer-overflow path), rounded once to micro-nats;
    the cell weight is an exact ppm floor-div; the contribution is pure
    integer. NULLs in either column are excluded (the drift-family
    convention). Only observed cells contribute (the plug-in estimator —
    empty cells have P(ab)=0 and contribute 0 by the limit).

    One hash aggregate to |A×B| observed cells, then bounded-cardinality
    windows for the marginals and total. Output: (a, b, n_ab, p_ppm,
    lr_micro_nats, contrib_micro, mi_micro), ordered by (a, b).
    """
    from pyspark.sql import Window

    MICRO = 1_000_000
    nn = F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    cells = (
        df.filter(nn)
        .groupBy(
            F.col(a_col).cast("string").alias("a"),
            F.col(b_col).cast("string").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    scored = (
        cells.withColumn("_N", F.sum("n_ab").over(w_all))
        .withColumn("_na", F.sum("n_ab").over(w_a))
        .withColumn("_nb", F.sum("n_ab").over(w_b))
        .withColumn("p_ppm", F.expr(f"n_ab * {MICRO} div _N"))
        .withColumn(
            "lr_micro_nats",
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.col("_N").cast("double"))
                    / (F.col("_na").cast("double") * F.col("_nb").cast("double"))
                )
                * F.lit(1_000_000.0)
            ).cast("long"),
        )
        .withColumn(
            "contrib_micro", F.expr(f"p_ppm * lr_micro_nats div {MICRO}")
        )
    )
    return (
        scored.withColumn("mi_micro", F.sum("contrib_micro").over(w_all))
        .select(
            "a", "b", "n_ab", "p_ppm", "lr_micro_nats", "contrib_micro", "mi_micro"
        )
        .orderBy("a", "b")
    )
