"""PII redaction, repetition signals, TF-IDF, decontamination
(operators/text.py, operators/dedup.py — LLM-pipeline hygiene extensions)."""

from __future__ import annotations

import math

from observation_lakehouse_spark.operators.dedup import decontaminate
from observation_lakehouse_spark.operators.text import (
    redact_pii,
    repetition_score,
    tfidf_terms,
)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_redact_pii_planted(spark):
    row = redact_pii(
        _docs(spark, ["mail bob@x.co and bob.smith+spam@sub.example.org ip 10.0.0.1 tel +12345678"])
    ).collect()[0]
    assert row["n_email"] == 2 and row["n_ip"] == 1 and row["n_phone"] == 1
    assert row["redacted_text"] == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"


def test_redact_pii_counts_match_emitted_tokens(spark):
    """Digit runs inside an email local-part are consumed by the email
    replacement and must NOT also count as a phone: every n_<kind> equals the
    number of <KIND> tokens in redacted_text (ADVICE r03)."""
    row = redact_pii(_docs(spark, ["reach a+1234567@x.com or +19998887777"])).collect()[0]
    assert row["redacted_text"] == "reach <EMAIL> or <PHONE>"
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (1, 0, 1)


def test_redact_pii_clean_text_untouched(spark):
    row = redact_pii(_docs(spark, ["no pii here at all"])).collect()[0]
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (0, 0, 0)
    assert row["redacted_text"] == "no pii here at all"


def test_repetition_score_signals(spark):
    rows = {
        r["doc_id"]: r
        for r in repetition_score(
            _docs(spark, ["a b a b a b", "all words are unique here", ""])
        ).collect()
    }
    # "a b" repeated: 6 tokens, 2 distinct; bigrams: ab,ba,ab,ba,ab → top 3/5
    assert rows[0]["n_tokens"] == 6
    assert rows[0]["distinct_token_ratio"] == round(2 / 6, 6)
    assert rows[0]["top_bigram_frac"] == round(3 / 5, 6)
    assert rows[1]["distinct_token_ratio"] == 1.0
    assert rows[1]["top_bigram_frac"] == 0.25  # all 4 bigrams distinct
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["distinct_token_ratio"] == 0.0 and rows[2]["top_bigram_frac"] == 0.0


def test_tfidf_ranks_discriminative_terms_first(spark):
    out = tfidf_terms(
        _docs(spark, ["common rare rare", "common other", "common thing"]), k=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 'rare' tf=2 df=1 → 2·ln(3); 'common' tf=1 df=3 → 0
    top = by_doc[0][0]
    assert top["term"] == "rare" and top["tf"] == 2 and top["df"] == 1
    assert top["tfidf"] == round(2 * math.log(3), 6)
    assert [r["term_rank"] for r in by_doc[0]] == [1, 2]


def test_decontaminate_planted_overlap(spark):
    shared = "one two three four five six seven"
    train = _docs(spark, [shared + " extra tail words here", "totally different text with no overlap at all"])
    bench = spark.createDataFrame([(100, shared)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in decontaminate(train, bench, ngram=5, min_hits=3).collect()}
    # doc 0 shares the 3 five-grams of `shared` → contaminated; doc 1 absent
    assert set(out) == {0}
    assert out[0]["n_shared_ngrams"] == 3
    assert out[0]["n_benchmark_docs"] == 1
    assert bool(out[0]["contaminated"]) is True


def test_decontaminate_below_threshold_not_flagged(spark):
    train = _docs(spark, ["alpha beta gamma delta epsilon unrelated suffix"])
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = decontaminate(train, bench, ngram=5, min_hits=3).collect()
    assert len(out) == 1 and bool(out[0]["contaminated"]) is False
    assert out[0]["n_shared_ngrams"] == 1


def test_bloom_decontaminate_has_no_false_negatives(spark):
    from observation_lakehouse_spark.operators.dedup import bloom_decontaminate

    shared = "one two three four five six seven"
    train = _docs(
        spark,
        [shared + " extra tail words here", "totally different text with no overlap at all"],
    )
    bench = spark.createDataFrame([(100, shared)], "doc_id long, text string")
    exact = {r["doc_id"]: r for r in decontaminate(train, bench, ngram=5, min_hits=3).collect()}
    bloom = {
        r["doc_id"]: r for r in bloom_decontaminate(train, bench, ngram=5, min_hits=3).collect()
    }
    # Bloom semantics: every exactly-shared gram is flagged (no false
    # negatives) -> per-doc bloom hit count upper-bounds the exact count.
    assert set(exact) <= set(bloom)
    for k in exact:
        assert bloom[k]["n_bloom_hits"] >= exact[k]["n_shared_ngrams"]
    assert bool(bloom[0]["bloom_flagged"]) is True


def test_bloom_decontaminate_clean_corpus_mostly_silent(spark):
    from observation_lakehouse_spark.operators.dedup import bloom_decontaminate

    train = _docs(spark, [f"completely unique document number {i} with words w{i} x{i} y{i} z{i}" for i in range(20)])
    bench = spark.createDataFrame(
        [(100, "benchmark holdout text that shares nothing with the corpus")],
        "doc_id long, text string",
    )
    # with a 4M-bit filter and ~10 grams set, FP probability ~ (1e-5)^4: empty
    assert bloom_decontaminate(train, bench).count() == 0
