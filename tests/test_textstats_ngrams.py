"""with_gopher_ngram_fracs (one-pass Arrow kernel) must be
output-IDENTICAL to the chained SQL sorted-run forms — that equality
is what carries the DuckDB oracle over to the production kernel."""

from __future__ import annotations

from pyspark.sql import functions as F

from textract_demo_spark.datapipe.textstats import (
    with_dup_ngram_char_frac, with_gopher_ngram_fracs,
    with_top_ngram_char_frac)

COLS = ["top_2gram_char_frac_bp", "top_3gram_char_frac_bp",
        "dup_5gram_char_frac_bp", "dup_6gram_char_frac_bp"]


def _sql_form(docs):
    out = with_top_ngram_char_frac(docs, 2)
    out = with_top_ngram_char_frac(out, 3)
    out = with_dup_ngram_char_frac(out, 5)
    return with_dup_ngram_char_frac(out, 6)


def _assert_equal(docs):
    a = {r["doc_id"]: tuple(r[c] for c in COLS)
         for r in with_gopher_ngram_fracs(docs).collect()}
    b = {r["doc_id"]: tuple(r[c] for c in COLS)
         for r in _sql_form(docs).collect()}
    assert a == b, {k: (a[k], b[k]) for k in a if a[k] != b[k]}


def test_kernel_equals_sql_on_corpus(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    _assert_equal(docs)


def test_kernel_equals_sql_on_edge_cases(spark):
    rows = [
        (0, ""), (1, "   "), (2, "one"), (3, "a b a b a b"),
        (4, "x y z x y z x y z x y z x y z"),          # dup 5-grams
        (5, "tab\tand\nnewline\x0bvertical\ffeed\rret"),  # Java \s set
        (6, "MiXeD CaSe MiXeD CaSe"),
        (7, "a a a a a a a a a a"),
        (8, "  leading and trailing  "),
        (9, "unicode café naïve café naïve"
            " café naïve café naïve"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    _assert_equal(docs)


def test_kernel_preserves_passthrough_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b", "keep-me")],
        "doc_id long, text string, extra string")
    r = with_gopher_ngram_fracs(docs).collect()[0]
    assert r["extra"] == "keep-me"
    assert set(COLS) <= set(r.asDict())


def test_kernel_null_text_is_empty(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = with_gopher_ngram_fracs(docs).collect()[0]
    assert all(r[c] == 0 for c in COLS)
