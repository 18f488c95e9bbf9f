"""Bloom membership: bitmap kernel == position-set join (the two
representations of the same function), zero false negatives, sane
false-positive rate, shuffle-free plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.datapipe.bloom import (bloom_position_rows,
                                                bloom_probe,
                                                bloom_probe_join,
                                                build_bloom_bitmap)

M, K = 1 << 16, 5


def _corpus(spark, n=300, tag="c"):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{tag} document body number "),
                 F.col("id").cast("string"),
                 F.lit(" with shared phrasing")).alias("text"))


def test_bitmap_equals_join_form(spark):
    corpus = _corpus(spark, 300, "c")
    # mixed batch: 120 members + 80 non-members, unique text per row
    batch = (_corpus(spark, 120, "c")
             .unionByName(_corpus(spark, 80, "x")))
    bitmap = build_bloom_bitmap(corpus, m_bits=M, k=K)
    got = {r["text"]: r["maybe_seen"]
           for r in bloom_probe(batch, bitmap, m_bits=M, k=K)
           .select("text", "maybe_seen").collect()}
    ref_flags = {r["doc_id"]: r["maybe_seen"]
                 for r in bloom_probe_join(
                     batch.withColumn(
                         "doc_id",
                         F.xxhash64("text")),  # unique per text
                     bloom_position_rows(corpus, m_bits=M, k=K),
                     m_bits=M, k=K).collect()}
    ref = {r["text"]: ref_flags[r["doc_id"]]
           for r in batch.withColumn("doc_id", F.xxhash64("text"))
           .select("doc_id", "text").collect()}
    assert got == ref and len(got) == 200


def test_zero_false_negatives(spark):
    corpus = _corpus(spark, 400)
    bitmap = build_bloom_bitmap(corpus, m_bits=M, k=K)
    flags = (bloom_probe(corpus, bitmap, m_bits=M, k=K)
             .agg(F.min(F.col("maybe_seen").cast("int")))
             .collect()[0][0])
    assert flags == 1  # every member flags


def test_false_positive_rate_bounded(spark):
    corpus = _corpus(spark, 400, "c")
    unseen = _corpus(spark, 400, "zz-unseen")
    bitmap = build_bloom_bitmap(corpus, m_bits=M, k=K)
    fp = (bloom_probe(unseen, bitmap, m_bits=M, k=K)
          .agg(F.sum(F.col("maybe_seen").cast("int")))
          .collect()[0][0])
    # theoretical FPR at n=400, m=2^16, k=5 is ~(nk/m)^k ~ 8e-8;
    # allow slack but any real leakage fails
    assert fp == 0, fp


def test_md5_mode_matches_xxhash_semantics(spark):
    """Hash family changes positions, not semantics: planted members
    flag in both modes."""
    corpus = _corpus(spark, 100)
    for mode in ("xxhash64", "md5"):
        bitmap = build_bloom_bitmap(corpus, m_bits=M, k=K,
                                    hash_mode=mode)
        n = (bloom_probe(corpus, bitmap, m_bits=M, k=K, hash_mode=mode)
             .filter("maybe_seen").count())
        assert n == 100, (mode, n)


def test_normalization_applies(spark):
    corpus = _corpus(spark, 50)
    noisy = corpus.select(
        "doc_id",
        F.concat(F.lit("   "), F.upper("text"),
                 F.lit("  ")).alias("text"))
    bitmap = build_bloom_bitmap(corpus, m_bits=M, k=K)
    n = (bloom_probe(noisy, bitmap, m_bits=M, k=K)
         .filter("maybe_seen").count())
    assert n == 50  # case/whitespace-insensitive membership


def test_probe_plan_no_shuffle(spark):
    corpus = _corpus(spark, 50)
    bitmap = build_bloom_bitmap(corpus, m_bits=M, k=K)
    p = (bloom_probe(_corpus(spark, 50), bitmap, m_bits=M, k=K)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p, p[:2000]
    # base hashes must be projected BEFORE the lambda (no md5/xxhash
    # inside the transform) — the fold-through-lambda-var perf trap
    assert "transform" in p


def test_bad_m_bits_rejected(spark):
    with pytest.raises(ValueError):
        build_bloom_bitmap(_corpus(spark, 5), m_bits=1001, k=3)
