"""Bradley–Terry MM ratings (operators/ranking.py)."""

from __future__ import annotations

import random

import pytest

from observation_lakehouse_spark.operators.ranking import bradley_terry

MS = 1_000_000 * 1_000_000_000
MICRO = 1_000_000


def _reference_bt(battle_rows: list[tuple[int, int]], n_rounds: int):
    """Pure-Python replica of the EXACT integer MM iteration — same
    smoothing, same fixed-point scales, same truncating divisions."""
    raw: dict[tuple[int, int], int] = {}
    for w, l in battle_rows:
        if w == l:
            continue
        raw[(w, l)] = raw.get((w, l), 0) + 1
    pairs: dict[tuple[int, int], int] = {}
    for (a, b), n in raw.items():
        pairs[(a, b)] = pairs.get((a, b), 0) + n
        pairs.setdefault((b, a), 0)
    pairs = {k: v + 1 for k, v in pairs.items()}
    t = {(a, b): (n, n + pairs[(b, a)]) for (a, b), n in pairs.items()}
    items = sorted({a for a, _ in pairs})
    W = {i: sum(n for (a, _), (n, _t) in t.items() if a == i) for i in items}
    n_items = len(items)
    wm = {i: MICRO for i in items}
    for _ in range(n_rounds):
        d = {
            i: sum(
                (t_ab * MS) // (wm[a] + wm[b])
                for (a, b), (_n, t_ab) in t.items()
                if a == i
            )
            for i in items
        }
        up = {i: (W[i] * MS) // d[i] for i in items}
        sw = sum(up.values())
        wm = {i: (up[i] * n_items * MICRO) // sw for i in items}
    return wm


def test_bradley_terry_matches_integer_reference(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(6), rng.randrange(6)) for _ in range(400)]
    rows = [(w, l) for w, l in rows if w != l]
    df = spark.createDataFrame(rows, "winner_id int, loser_id int")
    got = {r["item"]: r["rating_micro"] for r in bradley_terry(df, n_rounds=3).collect()}
    want = _reference_bt(rows, 3)
    assert got == want


def test_bradley_terry_recovers_planted_order(spark):
    """Deterministic dominance: i beats j whenever i < j — ratings must be
    strictly decreasing in item id, and wins/battles are the raw counts."""
    rows = [(i, j) for i in range(4) for j in range(4) if i < j for _ in range(10)]
    df = spark.createDataFrame(rows, "winner_id int, loser_id int")
    out = bradley_terry(df, n_rounds=6).collect()
    assert [r["item"] for r in out] == [0, 1, 2, 3]
    ratings = [r["rating_micro"] for r in out]
    assert ratings == sorted(ratings, reverse=True)
    assert out[0]["wins"] == 30 and out[0]["battles"] == 30
    assert out[3]["wins"] == 0 and out[3]["battles"] == 30
    # gauge: ratings sum to n_items * 1e6 up to truncation
    assert abs(sum(ratings) - 4 * MICRO) <= 4


def test_bradley_terry_edges(spark):
    empty = spark.createDataFrame([], "winner_id int, loser_id int")
    assert bradley_terry(empty).collect() == []
    # self-battles and NULLs are ignored
    df = spark.createDataFrame(
        [(1, 1), (None, 2), (1, None), (1, 2)], "winner_id int, loser_id int"
    )
    out = bradley_terry(df, n_rounds=2).collect()
    assert {r["item"] for r in out} == {1, 2}
    with pytest.raises(ValueError):
        bradley_terry(df, n_rounds=0)


def test_pairwise_win_matrix_counts_and_wilson(spark):
    from observation_lakehouse_spark.operators.ranking import pairwise_win_matrix

    rows = [("a", "b")] * 9 + [("b", "a")] * 1 + [("c", "a")] * 4
    df = spark.createDataFrame(rows, "winner_id string, loser_id string")
    out = {(r["item_a"], r["item_b"]): r for r in pairwise_win_matrix(df).collect()}
    ab = out[("a", "b")]
    assert (ab["wins_ab"], ab["wins_ba"], ab["battles"]) == (9, 1, 10)
    assert ab["win_rate_ppm"] == 900_000
    # Wilson lower bound for 9/10 at z=1.96: ~0.59585
    import math

    p, n, z2, z = 0.9, 10.0, 3.8416, 1.96
    want = (p + z2 / (2 * n) - z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (
        1 + z2 / n
    )
    assert abs(ab["wilson_low_ppm"] - round(want * 1e6)) <= 1
    ac = out[("a", "c")]
    assert (ac["wins_ab"], ac["wins_ba"]) == (0, 4)  # a lost all 4 to c
