"""Query-family operators of the observation lakehouse.

One module per family from SURVEY.md §2:

- :mod:`srm` — Stimulus-Response-Matrix output view (dynamic pivot V1 + the
  scale-safe map-column variant).
- :mod:`clustering` — behavioral clustering by ordered output traces and the
  consensus (majority-vote) oracle (A7-A12).
- :mod:`joins` — three-way observation/code/tests join (J1/J2).
- :mod:`stats` — per-problem and global dataset statistics (A5/A6/A12/A13).
- :mod:`dedup` — exact / MinHash-LSH / SimHash / n-gram-Jaccard deduplication
  (LLM-pipeline extension).
- :mod:`similarity` — embedding similarity search: brute-force cosine top-k and
  LSH-bucketed ANN (extension).
- :mod:`text` — text-analysis operators: language ID, quality scoring, token
  counting, document fingerprinting (extension).
- :mod:`multimodal` — binary-column plumbing for image/audio/video payloads
  (extension; pure-Python codecs where feasible, fallbacks clearly marked).
- :mod:`behavior` — funnel analysis, cohort retention, multi-resolution time
  rollups over event streams (extension).
- :mod:`cdc` — change-data-capture log compaction and MERGE-style upsert
  (extension).
- :mod:`graph` — connected components and duplicate-cluster resolution.
- :mod:`sessionization`, :mod:`embedding_dedup` — gap sessionization and
  embedding-cosine near-dup.
"""

from observation_lakehouse_spark.operators.behavior import (
    cohort_retention,
    funnel,
    multires_rollup,
)
from observation_lakehouse_spark.operators.cdc import apply_changes, latest_per_key
from observation_lakehouse_spark.operators.clustering import (
    behavioral_clustering,
    consensus_oracle,
)
from observation_lakehouse_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_lsh_admit,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from observation_lakehouse_spark.operators.joins import (
    asof_join,
    range_join,
    three_way_join,
)
from observation_lakehouse_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    lsh_ann_topk,
)
from observation_lakehouse_spark.operators.srm import srm_output_map, srm_output_view
from observation_lakehouse_spark.operators.stats import dataset_stats, per_problem_stats
from observation_lakehouse_spark.operators.retrieval import (
    bm25_rank,
    cms_heavy_hitters,
    phrase_search,
)
from observation_lakehouse_spark.operators.text import (
    document_fingerprints,
    domain_mixture,
    language_id,
    quality_score,
    redact_pii,
    repetition_score,
    tfidf_terms,
    token_stats,
    winnowing_fingerprints,
)

__all__ = [
    "srm_output_view",
    "srm_output_map",
    "behavioral_clustering",
    "consensus_oracle",
    "three_way_join",
    "asof_join",
    "range_join",
    "dataset_stats",
    "per_problem_stats",
    "exact_dedup",
    "minhash_lsh_admit",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_assign",
    "language_id",
    "quality_score",
    "token_stats",
    "document_fingerprints",
    "funnel",
    "cohort_retention",
    "multires_rollup",
    "latest_per_key",
    "apply_changes",
    "decontaminate",
    "redact_pii",
    "repetition_score",
    "tfidf_terms",
    "bm25_rank",
    "cms_heavy_hitters",
    "phrase_search",
    "winnowing_fingerprints",
    "domain_mixture",
]
