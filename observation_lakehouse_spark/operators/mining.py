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
