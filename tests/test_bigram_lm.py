"""with_bigram_surprisal (Stupid-Backoff bigram LM, integer bits):
hand-computed scores on a tiny corpus, backoff/OOV arms, zero-
transition docs, and frozen-model scoring of a second corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from textract_demo_spark.datapipe.textstats import (
    BACKOFF_PENALTY_BITS, bigram_counts, unigram_counts,
    with_bigram_surprisal)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: (r.n_transitions, r.hit_bp, r.bits_milli)
            for r in df.collect()}


def test_hand_computed_bits(spark):
    # corpus tokens: a b a b a c (6 total -> total_bits = 2);
    # unigram counts: a=3 b=2 c=1(cut); bigrams: (a,b)=2 kept,
    # (b,a)=1 cut, (a,c)=1 cut -- those transitions back off
    docs = _docs(spark, ["a b a b", "a c"])
    out = _by_id(with_bigram_surprisal(docs, min_count=2))
    # doc0 transitions: (a,b) hit bits=floor(log2(3 div 2))=0,
    # (b,a) miss: 2 + 2 - bits(a=3 ->1) = 3, (a,b) hit 0 -> sum 3
    assert out[0] == (3, 6666, 1000)
    # doc1: (a,c) miss, c OOV (bits2=0): 2 + 2 - 0 = 4
    assert out[1] == (1, 0, 4000)


def test_short_docs_emit_zeros(spark):
    docs = _docs(spark, ["solo", "", "   ", "a b a b"])
    out = _by_id(with_bigram_surprisal(docs))
    for i in (0, 1, 2):
        assert out[i] == (0, 0, 0)
    assert out[3][0] == 3


def test_repetition_scores_low(spark):
    # the property the unigram LM cannot see: ordered repetition is
    # maximally predictable, shuffled text is not
    rep = "x y " * 30
    mix = "x x y x y y x x x y y x y x x y y y x y " * 3
    docs = _docs(spark, [rep, mix])
    out = _by_id(with_bigram_surprisal(docs))
    assert out[0][2] < out[1][2]


def test_frozen_model_scores_new_corpus(spark):
    corpus = _docs(spark, ["a b a b a b", "b a b a"])
    vocab = unigram_counts(corpus)
    bigrams = bigram_counts(corpus)
    new = _docs(spark, ["a b", "q q"])
    out = _by_id(with_bigram_surprisal(new, vocab=vocab,
                                       bigrams=bigrams))
    # (a,b)=3 in the frozen corpus, c(a)=4 -> floor(log2(4//3))=0, hit
    assert out[0] == (1, 10000, 0)
    # (q,q) unseen, q OOV: penalty + bits(total=10 -> 3) - 0
    assert out[1] == (1, 0, (BACKOFF_PENALTY_BITS + 3) * 1000)


def test_hit_rate_basis_points(spark):
    docs = _docs(spark, ["a b c a b c", "a b"])
    out = _by_id(with_bigram_surprisal(docs))
    # doc0: (a,b)x2 hit, (b,c)x2 hit, (c,a) miss -> 4/5 hits
    assert out[0][1] == 10000 * 4 // 5
