"""BPE: the Spark trainer must reproduce the pure-Python reference
(Sennrich alg.) merge-for-merge; the canonical applier and the SQL
replace-chain form must segment identically; the frozen artifact must
be reproducible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.datapipe.bpe import (FROZEN_MERGES,
                                              _BPE_FIXTURE,
                                              _ref_segment, apply_bpe,
                                              bpe_sql_expr,
                                              ref_train_bpe, train_bpe)


def _word_freqs(text: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for w in text.lower().split():
        out[w] = out.get(w, 0) + 1
    return out


def test_frozen_merges_reproducible():
    assert ref_train_bpe(_word_freqs(_BPE_FIXTURE), 16) == FROZEN_MERGES
    assert len(FROZEN_MERGES) == 16
    # the fixture was chosen so merges reach real morphemes
    joined = ["".join(p) for p in FROZEN_MERGES]
    assert "lower</w>" in joined and "the</w>" in joined


def test_spark_trainer_matches_reference(spark):
    docs = spark.createDataFrame([(0, _BPE_FIXTURE)],
                                 "doc_id BIGINT, text STRING")
    got = train_bpe(docs, 16)
    assert got == FROZEN_MERGES


def test_spark_trainer_matches_reference_random_corpus(spark):
    import random
    rng = random.Random(11)
    vocab = ["alpha", "alphabet", "beta", "betamax", "gamma", "gam",
             "aaaa", "aaa", "delta", "del", "epsilon"]
    texts = [" ".join(rng.choice(vocab) for _ in range(30))
             for _ in range(20)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING")
    freqs: dict[str, int] = {}
    for t in texts:
        for w, c in _word_freqs(t).items():
            freqs[w] = freqs.get(w, 0) + c
    assert train_bpe(docs, 12) == ref_train_bpe(freqs, 12)


def test_trainer_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([(0, "a b c")],
                                 "doc_id BIGINT, text STRING")
    # single-char words: pairs are only (char, </w>); after merging
    # all of them nothing is left to merge
    merges = train_bpe(docs, 50)
    assert 0 < len(merges) < 50


def test_canonical_equals_sql_form(spark):
    texts = [_BPE_FIXTURE, "aaaa aaa a", "", "   ",
             "MIXED Case\tspacing the lowest",
             "unseen zqxj words lower"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING")
    canonical = apply_bpe(docs).select(
        "doc_id", F.concat_ws(" ", "bpe_tokens").alias("s"))
    sql_form = docs.select(
        "doc_id", F.expr(bpe_sql_expr("text", dialect="spark"))
        .alias("s"))
    a = {r["doc_id"]: r["s"] for r in canonical.collect()}
    b = {r["doc_id"]: r["s"] for r in sql_form.collect()}
    assert a == b


def test_segment_examples():
    assert _ref_segment("lowest", FROZEN_MERGES) == ["lowe", "st</w>"]
    assert _ref_segment("the", FROZEN_MERGES) == ["the</w>"]
    assert _ref_segment("zq", FROZEN_MERGES) == ["z", "q", "</w>"]


def test_sql_form_plan_no_shuffle_no_python(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id BIGINT, text STRING")
    df = docs.select(F.expr(bpe_sql_expr("text")).alias("s"))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Python" not in p  # fully codegen'd replace chain
