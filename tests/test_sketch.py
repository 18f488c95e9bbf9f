"""Sketch + chunking properties: HLL merge-associativity and
estimator accuracy, CMS overestimate invariant, chunk coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestHLL:
    def test_merge_equals_whole_build(self, spark):
        """merge(build(A), build(B)) == build(A ∪ B) — the property
        that makes per-partition / per-snapshot sketches roll up
        losslessly."""
        from textract_demo_spark.datapipe.sketch import (
            hll_merge, hll_registers)
        docs = _docs(spark)
        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        whole = hll_registers(docs, p=6).orderBy("source", "bucket")
        merged = hll_merge(hll_registers(a, p=6),
                           hll_registers(b, p=6)).orderBy(
            "source", "bucket")
        assert [r.asDict() for r in whole.collect()] == \
            [r.asDict() for r in merged.collect()]

    def test_register_rho_bounds(self, spark):
        from textract_demo_spark.datapipe.sketch import hll_registers
        regs = hll_registers(_docs(spark), p=8).collect()
        assert regs
        for r in regs:
            assert 0 <= r.bucket < 256
            assert 1 <= r.rho <= 53  # W+1 for p=8 over 60 hash bits

    def test_estimate_accuracy(self, spark):
        """Estimator lands within ~5 sigma of truth on distinct texts
        (sigma = 1.04/sqrt(m); includes the linear-counting branch at
        this cardinality)."""
        from textract_demo_spark.datapipe.sketch import (
            hll_estimate, hll_registers)
        n = 3000
        df = spark.range(n).select(
            F.lit("g").alias("source"),
            F.concat(F.lit("value-"), F.col("id")).alias("text"))
        p = 8
        est = hll_estimate(hll_registers(df, p=p), p=p).collect()[0]
        sigma = 1.04 / (1 << p) ** 0.5
        assert abs(est.n_distinct_est - n) / n < 5 * sigma

    def test_duplicates_do_not_move_registers(self, spark):
        from textract_demo_spark.datapipe.sketch import hll_registers
        docs = _docs(spark)
        doubled = docs.unionByName(docs)
        one = hll_registers(docs, p=6).orderBy("source", "bucket")
        two = hll_registers(doubled, p=6).orderBy("source", "bucket")
        assert [r.asDict() for r in one.collect()] == \
            [r.asDict() for r in two.collect()]


class TestCMS:
    def test_overestimate_invariant_and_absent_keys(self, spark):
        """est >= true count for present keys; absent keys can only
        report collision mass (>= 0), and with a wide sketch the
        top keys are exact."""
        from textract_demo_spark.datapipe.sketch import (
            cms_build, cms_probe)
        from textract_demo_spark.datapipe.textstats import _tokens
        tok = (_docs(spark)
               .select(F.explode(F.expr(_tokens("text"))).alias("token")))
        exact = tok.groupBy("token").agg(
            F.count("*").cast("long").alias("n"))
        sketch = cms_build(exact, "token", depth=3, width=2048,
                           weight_col="n")
        probes = exact.select("token").unionByName(
            spark.createDataFrame([("never-seen-key-xyz",)],
                                  "token STRING"))
        est = cms_probe(sketch, probes, "token", depth=3, width=2048)
        joined = {r.token: (r.n, r.cms_est)
                  for r in exact.join(est, "token", "right")
                  .select("token", "n", "cms_est").collect()}
        for token, (n, e) in joined.items():
            true_n = n if n is not None else 0
            assert e >= true_n, (token, n, e)
        assert joined["never-seen-key-xyz"][1] >= 0

    def test_total_mass_per_depth_row(self, spark):
        """Each depth row holds the full stream mass — the sketch is
        depth independent projections of the same counts."""
        from textract_demo_spark.datapipe.sketch import cms_build
        from textract_demo_spark.datapipe.textstats import _tokens
        tok = (_docs(spark)
               .select(F.explode(F.expr(_tokens("text"))).alias("token")))
        total = tok.count()
        sketch = cms_build(tok, "token", depth=3, width=64)
        per_i = {r.i: r.s for r in sketch.groupBy("i")
                 .agg(F.sum("cnt").alias("s")).collect()}
        assert per_i == {0: total, 1: total, 2: total}


class TestChunks:
    def test_full_coverage_and_overlap(self, spark):
        """Every token appears in >= 1 chunk; consecutive chunks share
        exactly size - stride tokens (except a short final chunk);
        stride-aligned reassembly reconstructs the normalized text."""
        from textract_demo_spark.datapipe.chunks import chunk_with_overlap
        docs = _docs(spark).limit(40)
        size, stride = 12, 8
        out = (chunk_with_overlap(docs, size=size, stride=stride)
               .orderBy("doc_id", "chunk_idx").collect())
        norm = {r.doc_id: " ".join(r.text.split())
                for r in docs.select("doc_id", "text").collect()}
        by_doc: dict[int, list] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, chunks in by_doc.items():
            toks = norm[doc_id].split(" ")
            rebuilt: list[str] = []
            for i, c in enumerate(chunks):
                assert c.chunk_idx == i
                ctoks = c.chunk_text.split(" ")
                assert len(ctoks) == c.n_chunk_tokens <= size
                assert ctoks == toks[i * stride: i * stride + size]
                rebuilt.extend(ctoks[: stride] if i < len(chunks) - 1
                               else ctoks)
            # trailing chunks that fully overlap a prior chunk's tail
            # repeat tokens; coverage means the stride-prefix concat
            # plus the last chunk reproduces the document
            assert " ".join(rebuilt[: len(toks)]) == norm[doc_id]

    def test_empty_and_whitespace_docs_yield_no_chunks(self, spark):
        from textract_demo_spark.datapipe.chunks import chunk_with_overlap
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one two")],
            "doc_id BIGINT, text STRING")
        rows = chunk_with_overlap(df, size=4, stride=2).collect()
        assert {r.doc_id for r in rows} == {3}

    def test_stride_validation(self, spark):
        from textract_demo_spark.datapipe.chunks import chunk_with_overlap
        with pytest.raises(ValueError):
            chunk_with_overlap(_docs(spark), size=4, stride=5)
        with pytest.raises(ValueError):
            chunk_with_overlap(_docs(spark), size=4, stride=0)


class TestTfidf:
    def test_stopword_scores_zero_and_rare_terms_win(self, spark):
        from textract_demo_spark.datapipe.textstats import tfidf_top_terms
        df = spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "the dog ran to the park"),
             (3, "the bird flew over the sea"),
             (4, "the fish swam under the boat")],
            "doc_id BIGINT, text STRING")
        out = tfidf_top_terms(df, k=2).collect()
        from textract_demo_spark.datapipe.dedup import release_cached
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, rows in by_doc.items():
            for r in rows:
                # 'the' appears in all 4 docs -> idf_bits 0 -> never
                # outranks a doc-unique term (idf_bits 2)
                assert r.token != "the"
                assert r.df < 4
                assert r.idf_bits == 2
                assert r.score == r.tf * r.idf_bits


def test_logq_sketch_merge_and_bounds(spark):
    """Log-bucket quantile sketch: merged shards equal the whole-
    corpus sketch; quantile upper bounds are >= the exact quantile
    and within 2x (the log-histogram guarantee); v=0 answers 0."""
    import random

    from textract_demo_spark.datapipe.sketch import (logq_merge,
                                                     logq_quantile,
                                                     logq_sketch)
    rng = random.Random(5)
    vals = [rng.randrange(1, 100000) for _ in range(500)] + [0, 1]
    df = spark.createDataFrame(
        [("s", v) for v in vals], "source string, v long")
    whole = logq_sketch(df, "v")
    parts = logq_merge(
        logq_sketch(df.filter(F.col("v") % 3 == 0), "v"),
        logq_sketch(df.filter(F.col("v") % 3 == 1), "v"),
        logq_sketch(df.filter(F.col("v") % 3 == 2), "v"))
    assert (sorted(map(tuple, whole.collect()))
            == sorted(map(tuple, parts.collect())))

    got = {r["q"]: r["q_upper"]
           for r in logq_quantile(whole, qs=(50, 99)).collect()}
    sv = sorted(vals)
    for q in (50, 99):
        exact = sv[-(-q * len(sv) // 100) - 1]  # ceil-rank exact
        assert got[q] >= exact
        assert got[q] <= 2 * max(exact, 1)


def test_logq_zero_bucket(spark):
    from textract_demo_spark.datapipe.sketch import (logq_quantile,
                                                     logq_sketch)
    df = spark.createDataFrame([("s", 0)] * 4, "source string, v long")
    got = logq_quantile(logq_sketch(df, "v"), qs=(50,)).collect()
    assert got[0]["q_upper"] == 0


class TestKMV:
    def test_exact_below_k(self, spark):
        """Groups with fewer than k distinct values get theta = full
        span and EXACT union/intersection counts."""
        from textract_demo_spark.datapipe.sketch import (
            _HASH_SPAN, kmv_set_ops, kmv_sketch)
        rows = ([("a", f"x{i}") for i in range(10)]
                + [("b", f"x{i}") for i in range(5, 15)])
        df = spark.createDataFrame(rows, "g string, v string")
        sk = kmv_sketch(df, value_col="v", group_cols=("g",), k=64)
        out = kmv_set_ops(sk, k=64, group_col="g").collect()
        assert len(out) == 1
        r = out[0]
        assert (r.g_a, r.g_b) == ("a", "b")
        assert r.theta == _HASH_SPAN
        assert r.n_union == 15 and r.n_inter == 5  # exact
        assert r.union_est == pytest.approx(15.0)
        assert r.inter_est == pytest.approx(5.0)

    def test_sketch_is_bottom_k_distinct(self, spark):
        from textract_demo_spark.datapipe.sketch import kmv_sketch
        docs = _docs(spark)
        sk = kmv_sketch(docs, value_col="text",
                        group_cols=("source",), k=8).collect()
        by_g = {}
        for r in sk:
            by_g.setdefault(r.source, []).append(r.h)
        for g, hs in by_g.items():
            assert len(hs) == len(set(hs)) <= 8

    def test_estimator_accuracy_union_inter(self, spark):
        """Theta estimates land near truth: two 600-element sets with
        200 shared values, k=256 (sigma ~ 1/sqrt(k) relative)."""
        from textract_demo_spark.datapipe.sketch import (
            kmv_set_ops, kmv_sketch)
        rows = ([("a", f"v{i}") for i in range(600)]
                + [("b", f"v{i}") for i in range(400, 1000)])
        df = spark.createDataFrame(rows, "g string, v string")
        sk = kmv_sketch(df, value_col="v", group_cols=("g",), k=256)
        r = kmv_set_ops(sk, k=256, group_col="g").collect()[0]
        assert r.union_est == pytest.approx(1000, rel=0.35)
        assert r.inter_est == pytest.approx(200, rel=0.6)

    def test_duplicates_do_not_move_sketch(self, spark):
        """KMV is a distinct-value sketch: replicating rows changes
        nothing."""
        from textract_demo_spark.datapipe.sketch import kmv_sketch
        base = spark.createDataFrame(
            [("a", f"v{i}") for i in range(50)], "g string, v string")
        dup = base.unionByName(base).unionByName(base)
        one = sorted(r.h for r in kmv_sketch(
            base, value_col="v", group_cols=("g",), k=16).collect())
        three = sorted(r.h for r in kmv_sketch(
            dup, value_col="v", group_cols=("g",), k=16).collect())
        assert one == three
