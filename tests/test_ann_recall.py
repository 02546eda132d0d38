"""Recall@k floors for the approximate ANN paths vs the exact baseline.

Mirrors the reference's cross-query consistency invariants (its notebooks
pin golden counts across query families): the approximate scale paths must
retrieve a stated fraction of the exact `cosine_topk` neighbor set, so a
regression in bucketing/probing (wrong signature, dropped probe, broken
cell ranking) fails loudly instead of silently degrading quality.

Floors are set from measured behavior on the synthetic testdata with margin:

- sign-LSH, 4 planes, probe radius 2: measured ~0.88 at sf0.01 and sf0.1.
  Theory: per-plane sign-agreement p ≈ 1 − θ/π ≈ 0.64 for these near-random
  embeddings (top-10 cosine ≈ 0.35–0.5 → θ ≈ 65°), so
  recall ≈ Σ_{i≤2} C(4,i)·p^(4−i)·(1−p)^i ≈ 0.86.  Floor: 0.80.
- IVF-flat, 8 cells, nprobe 4: measured ~0.56 at sf0.01, ~0.66 at sf0.1.
  Unstructured embeddings are IVF's adversarial case — the neighbor's cell is
  nearly independent of the query's, so recall ≈ the probed corpus fraction
  (~4.5/8 including the correlated own-cell boost). Floor: 0.45. Clustered
  corpora (IVF's design assumption) sit far above this floor.
"""

from __future__ import annotations

from pathlib import Path

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not Path(SF_DIR).exists(), reason="driver testdata not present"
)


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(spark):
    return _pairs(entrymod.q_ann_cosine_topk(spark, SF_DIR))


def test_lsh_recall_floor(spark, exact_pairs):
    approx = _pairs(entrymod.q_ann_lsh_topk(spark, SF_DIR))
    recall = len(exact_pairs & approx) / len(exact_pairs)
    assert recall >= 0.80, f"sign-LSH recall@10 regressed: {recall:.3f} < 0.80"


def test_ivf_recall_floor(spark, exact_pairs):
    approx = _pairs(entrymod.q_ann_ivf_topk(spark, SF_DIR))
    recall = len(exact_pairs & approx) / len(exact_pairs)
    assert recall >= 0.45, f"IVF nprobe=4 recall@10 regressed: {recall:.3f} < 0.45"
