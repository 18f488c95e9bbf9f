"""Hashed-ngram text classifier (datapipe/classifier.py): frozen
model reproduction, Python/Spark featurizer parity, held-out
generalization, integer decision exactness. The driver query
text_classifier_quality oracles Spark vs DuckDB scoring."""

from __future__ import annotations

from collections import Counter

from textract_demo_spark.datapipe.classifier import (
    NUM_BUCKETS, TEXT_CLF_BIAS_MICRO, TEXT_CLF_WEIGHTS_MICRO,
    _py_bucket, _py_features, labelled_text_corpus,
    train_text_classifier, with_text_classifier)


def test_frozen_model_reproduces():
    b, w = train_text_classifier()
    assert b == TEXT_CLF_BIAS_MICRO
    assert w == TEXT_CLF_WEIGHTS_MICRO
    assert len(w) == NUM_BUCKETS


def test_training_set_fully_separated():
    """The frozen integer model classifies its whole training corpus
    correctly — vocabularies are disjoint, so anything less means the
    trainer or the integer decision rule is broken."""
    for text, label in labelled_text_corpus():
        feats = _py_features(text)
        score = (max(len(feats), 1) * TEXT_CLF_BIAS_MICRO
                 + sum(TEXT_CLF_WEIGHTS_MICRO[_py_bucket(f)]
                       for f in feats))
        assert (score >= 0) == (label == 1), text[:50]


def test_python_spark_featurizer_parity(spark):
    """_py_features/_py_bucket mirror the SQL featurizer exactly:
    per-doc bucket multisets agree on ASCII text incl. the SQL-trim /
    Java-\\s edges (tabs, \\x0B, leading spaces, uppercase)."""
    from pyspark.sql import functions as F

    from textract_demo_spark.datapipe.dsir import _buckets
    rows = [
        (1, "The old river was quiet."),
        (2, "  leading spaces\tand\ttabs  "),
        (3, "MIXED Case WORDS here"),
        (4, "vertical\x0btab and form\x0cfeed"),
        (5, "one"),
        (6, "a b c d e f g"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = Counter(
        (r["doc_id"], r["bucket"])
        for r in _buckets(df, "text", "doc_id", NUM_BUCKETS,
                          "md5").collect())
    want = Counter(
        (i, _py_bucket(f, NUM_BUCKETS))
        for i, t in rows for f in _py_features(t))
    assert got == want


def test_heldout_generalization(spark):
    """Sentences/mash NOT in the training corpus classify correctly:
    function-word buckets carry positive weight, consonant-mash
    buckets negative, unseen buckets fall back to the bias."""
    rows = [
        (1, "The young man walked along the old road in the morning"
            " while the light fell on the quiet stones."),
        (2, "Everyone there agreed that the people would be done"
            " before the end of the morning."),
        (3, "qk zv xw jj pq vb nm tr qk zv xw jj pq vb nm tr"),
        (4, "@#$% !!! zzzz @#$% !!! zzzz @#$% !!! zzzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    labels = {r["doc_id"]: r["clf_label"]
              for r in with_text_classifier(df).collect()}
    assert labels[1] == "good" and labels[2] == "good"
    assert labels[3] == "junk" and labels[4] == "junk"


def test_custom_weights_roundtrip(spark):
    """Scoring with explicitly passed (bias, weights) equals the
    Python mirror — the path used for freshly retrained models."""
    b, w = train_text_classifier(epochs=50)
    rows = [(1, "the road was long"), (2, "zzqq kkpp vvrr")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["clf_score_micro"]
           for r in with_text_classifier(df, bias=b,
                                         weights=w).collect()}
    for i, t in rows:
        feats = _py_features(t)
        want = (max(len(feats), 1) * b
                + sum(w[_py_bucket(f)] for f in feats))
        assert got[i] == want
