"""DSIR importance resampling (datapipe/dsir.py): hashed-ngram
bucket models, integer-bits importance scores, deterministic top-k.
The driver query dsir_importance oracles the full pipeline against
DuckDB; these tests pin the operator-level semantics."""

from __future__ import annotations

from textract_demo_spark.datapipe.dsir import (
    dsir_bucket_model, dsir_topk, with_dsir_scores)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_model_counts_unigrams_plus_bigrams(spark):
    # "a b c" -> unigrams a,b,c + bigrams "a b","b c" = 5 features
    m = dsir_bucket_model(_corpus(spark, [(1, "a b c")]), num_buckets=8)
    rows = m.collect()
    assert sum(r["n"] for r in rows) == 5
    assert all(0 <= r["bucket"] < 8 for r in rows)


def test_single_token_doc_has_no_bigrams(spark):
    m = dsir_bucket_model(_corpus(spark, [(1, "hello")]), num_buckets=8)
    assert sum(r["n"] for r in m.collect()) == 1


def test_scores_rank_target_like_docs_higher(spark):
    """A raw doc written in the target's vocabulary must outscore a
    raw doc written in a disjoint vocabulary — the whole point of
    importance resampling."""
    target = _corpus(spark, [
        (100 + i, "alpha beta gamma delta epsilon zeta") for i in range(6)])
    raw = _corpus(spark, [
        (1, "alpha beta gamma delta alpha beta gamma"),
        (2, "zulu yankee xray whiskey victor uniform tango"),
    ])
    s = {r["doc_id"]: r["dsir_bits"]
         for r in with_dsir_scores(raw, target, num_buckets=4096).collect()}
    assert s[1] > s[2]


def test_scores_deterministic_and_length_accounted(spark):
    """Two runs agree exactly (no float anywhere), and duplicated
    text exactly doubles n_feats-per-doc bookkeeping."""
    target = _corpus(spark, [(9, "common words here")])
    raw = _corpus(spark, [(1, "common words"), (2, "common words")])
    a = sorted(with_dsir_scores(raw, target, num_buckets=64).collect())
    b = sorted(with_dsir_scores(raw, target, num_buckets=64).collect())
    assert a == b
    assert a[0]["dsir_bits"] == a[1]["dsir_bits"]  # identical text
    assert a[0]["n_feats"] == 3  # 2 unigrams + 1 bigram


def test_md5_and_xxhash_modes_agree_on_ranking(spark):
    """Hash families differ, the induced ordering should not (at
    bucket widths where collisions are negligible for a toy corpus)."""
    target = _corpus(spark, [(9, "alpha beta alpha beta alpha")])
    raw = _corpus(spark, [(1, "alpha beta alpha"),
                          (2, "omega psi chi")])
    for mode in ("xxhash64", "md5"):
        s = {r["doc_id"]: r["dsir_bits"]
             for r in with_dsir_scores(raw, target, num_buckets=4096,
                                       hash_mode=mode).collect()}
        assert s[1] > s[2], mode


def test_topk_deterministic_ties_by_id(spark):
    target = _corpus(spark, [(9, "alpha beta gamma")])
    raw = _corpus(spark, [(3, "alpha beta"), (1, "alpha beta"),
                          (2, "zulu yankee"), (4, "xray whiskey")])
    out = dsir_topk(raw, target, k=2, num_buckets=4096).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [1, 3]  # equal scores -> lower id first


def test_frozen_models_reusable(spark):
    """Scoring against precomputed (frozen) models equals scoring
    with models fit in-line — the stream-scoring path."""
    target = _corpus(spark, [(9, "alpha beta gamma delta")])
    raw = _corpus(spark, [(1, "alpha beta"), (2, "zulu yankee")])
    rm = dsir_bucket_model(raw, num_buckets=256)
    tm = dsir_bucket_model(target, num_buckets=256)
    inline = sorted(with_dsir_scores(raw, target,
                                     num_buckets=256).collect())
    frozen = sorted(with_dsir_scores(raw, target, num_buckets=256,
                                     raw_model=rm,
                                     target_model=tm).collect())
    assert inline == frozen
