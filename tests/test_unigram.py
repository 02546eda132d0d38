"""Unigram-LM tokenizer (r9): Viterbi segmentation vs a Python brute-force
reference, training invariants, and the OOV contract."""

from __future__ import annotations


def _brute_viterbi(word: str, vocab: dict[str, int], max_piece_len: int):
    """All OPTIMAL segmentations by exhaustive split enumeration (words are
    short) — an implementation-independent reference for score and piece
    count. Returns (winners, best_score) or None if not segmentable."""
    segs = []
    def rec(i, acc):
        if i == len(word):
            segs.append(list(acc))
            return
        for l in range(1, min(max_piece_len, len(word) - i) + 1):
            p = word[i : i + l]
            if p in vocab:
                acc.append(p)
                rec(i + l, acc)
                acc.pop()
    rec(0, [])
    if not segs:
        return None
    score = lambda seg: sum(vocab[p] for p in seg)
    best_score = max(score(s) for s in segs)
    winners = [s for s in segs if score(s) == best_score]
    return winners, best_score


def test_unigram_encode_matches_bruteforce(spark):
    from observation_lakehouse_spark.operators.text import unigram_encode

    vocab = {"a": -3_000_000, "b": -3_000_000, "c": -3_500_000,
             "ab": -2_000_000, "bc": -2_100_000, "abc": -1_500_000}
    docs = spark.createDataFrame(
        [(1, "abc ab"), (2, "abcabc b"), (3, "cab abba")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_encode(
        docs, list(vocab.items()), max_piece_len=3, max_word_len=8
    ).collect()}
    for doc_id, text in [(1, "abc ab"), (2, "abcabc b"), (3, "cab abba")]:
        exp_pieces = exp_lp = 0
        for w in text.split():
            res = _brute_viterbi(w, vocab, 3)
            assert res is not None
            winners, best_score = res
            exp_lp += best_score
            # all co-optimal segmentations here have equal length; assert so
            assert len({len(s) for s in winners}) == 1, (w, winners)
            exp_pieces += len(winners[0])
        r = out[doc_id]
        assert r.n_oov_words == 0
        assert (r.n_pieces, r.lp_total_micro) == (exp_pieces, exp_lp), (doc_id, r)


def test_unigram_encode_oov_rules(spark):
    from observation_lakehouse_spark.operators.text import unigram_encode

    vocab = {"a": -1_000_000, "b": -1_000_000}
    docs = spark.createDataFrame(
        # 'az': z not in vocab -> OOV; 'aaaaaaaaa' (9 > max_word_len=8) -> OOV
        [(1, "ab az aaaaaaaaa")],
        "doc_id long, text string",
    )
    r = unigram_encode(docs, list(vocab.items()), max_piece_len=2,
                       max_word_len=8).collect()[0]
    assert (r.n_words, r.n_oov_words, r.n_pieces) == (3, 2, 2)
    assert r.pieces_per_word == 2.0  # 'ab' -> a + b (the bigram isn't in vocab)


def test_unigram_train_invariants(spark):
    from observation_lakehouse_spark.operators.text import unigram_train_vocab

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cats sat"), (3, "a mat on a cat")],
        "doc_id long, text string",
    )
    rows = unigram_train_vocab(
        docs, vocab_size=8, seed_size=16, n_rounds=2,
        max_piece_len=3, max_word_len=8,
    ).collect()
    vocab = {r.piece: r for r in rows}
    # every single character of the corpus survives (coverage guarantee)
    chars = set("thecatsonmat a".replace(" ", ""))
    assert chars <= set(vocab)
    # frequent whole words become pieces and out-score their characters
    assert "the" in vocab and "cat" in vocab
    assert vocab["the"].lp_micro > vocab["t"].lp_micro
    # multi-char pieces bounded by vocab_size
    assert sum(1 for p in vocab if len(p) > 1) <= 8
    # counts are Viterbi counts: 'the' occurs 3 times in the corpus
    assert vocab["the"].cnt == 3
