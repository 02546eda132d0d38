"""dsir_select: hashed-ngram importance resampling (DSIR, Xie et al. 2023).

The oracle check proves cross-engine equality; these tests prove the
SEMANTICS on controlled corpora — target-like candidates outrank raw-like
ones, the score is the exact integer dot product the paper's log-ratio
formula gives, target docs never leak into the output, and the k boundary
tie-breaks on doc_id.
"""

from __future__ import annotations

import math

import pytest

from observation_lakehouse_spark.operators.text import dsir_select


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, text, lang, "src0", len(text)) for i, (text, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _bucket(s: str, n_buckets: int = 64) -> int:
    return (ord(s[0]) * 131 + len(s) * 7 + ord(s[-1])) % n_buckets


def _ref_scores(rows, n_buckets=64):
    """Pure-python replication of the paper formula with the repo's bucket."""
    feats = {}
    for i, (text, lang) in enumerate(rows):
        toks = [t.lower() for t in text.split() if t]
        fs = [_bucket(t, n_buckets) for t in toks] + [
            n_buckets + _bucket(f"{a} {b}", n_buckets)
            for a, b in zip(toks, toks[1:])
        ]
        feats[i] = (lang == "en", fs)
    c_t: dict[int, int] = {}
    c_r: dict[int, int] = {}
    for is_t, fs in feats.values():
        for f in fs:
            (c_t if is_t else c_r)[f] = (c_t if is_t else c_r).get(f, 0) + 1
    n_t, n_r = sum(c_t.values()), sum(c_r.values())
    denom = 2 * n_buckets
    all_f = set(c_t) | set(c_r)
    lr = {
        f: round(
            (
                math.log((c_t.get(f, 0) + 1) / (n_t + denom))
                - math.log((c_r.get(f, 0) + 1) / (n_r + denom))
            )
            * 1_000_000.0
        )
        for f in all_f
    }
    return {
        i: (len(fs), sum(lr[f] for f in fs))
        for i, (is_t, fs) in feats.items()
        if not is_t and fs
    }


ROWS = [
    ("the quick brown fox jumps over the lazy dog", "en"),
    ("the fast brown fox runs over the calm dog", "en"),
    ("quick brown fox over lazy dog the the", "fr"),  # target-like candidate
    ("zzz qqq www kkk vvv", "fr"),  # raw-only candidate
    ("der hund läuft über die wiese heute", "de"),
    ("zzz qqq www the over", "es"),
]


def test_scores_match_paper_formula_exactly(spark):
    got = {
        r.doc_id: (r.n_feats, r.logw_micro)
        for r in dsir_select(_docs(spark, ROWS)).collect()
    }
    assert got == _ref_scores(ROWS)


def test_target_like_candidate_outranks_raw_only(spark):
    out = dsir_select(_docs(spark, ROWS)).collect()
    rank = {r.doc_id: i for i, r in enumerate(out)}
    assert rank[2] < rank[3]  # English-vocab fr doc beats gibberish
    assert out[0].doc_id == 2


def test_target_docs_never_selected(spark):
    ids = {r.doc_id for r in dsir_select(_docs(spark, ROWS)).collect()}
    assert ids.isdisjoint({0, 1})


def test_k_limit_with_doc_id_tiebreak(spark):
    rows = [("the and of to", "en")] + [("zzz qqq", "fr")] * 5
    out = dsir_select(_docs(spark, rows), k=3).collect()
    # five identical candidates, identical scores — doc_id breaks the tie
    assert [r.doc_id for r in out] == [1, 2, 3]


def test_no_candidates_is_empty(spark):
    out = dsir_select(_docs(spark, [("the and of", "en")]))
    assert out.count() == 0
