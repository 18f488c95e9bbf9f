"""Line-level corpus cleaning (datapipe/lines.py): C4 line hygiene
predicates and corpus-wide keep-first line dedup. The driver queries
c4_line_filter / line_dedup_rewrite oracle both end-to-end; these
tests pin the edge semantics."""

from __future__ import annotations

from textract_demo_spark.datapipe.lines import c4_line_filter, line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_filter_predicates(spark):
    text = "\n".join([
        "This is a proper sentence.",        # kept
        "Short one.",                        # dropped: < 3 words
        "Ends with a question, right?",      # kept
        'He said "stop".',                   # kept: plain period end
        'He shouted "run!"',                 # kept: quote AFTER bang
        "Contains lorem ipsum so it goes.",  # dropped: lorem marker
        "var config = { debug: true };",     # dropped: brace
        "no punctuation at the end",         # dropped
        "",                                  # dropped: empty
    ])
    out = c4_line_filter(_docs(spark, [(1, text)])).collect()[0]
    assert out["clean_text"] == ("This is a proper sentence.\n"
                                 "Ends with a question, right?\n"
                                 'He said "stop".\n'
                                 'He shouted "run!"')
    assert out["n_lines_kept"] == 4
    assert out["n_lines_dropped"] == 5


def test_c4_line_filter_drops_empty_docs(spark):
    rows = [(1, "no terminal punct\nstill none"),
            (2, "A single proper sentence survives here.")]
    out = {r["doc_id"]: r for r in
           c4_line_filter(_docs(spark, rows)).collect()}
    assert 1 not in out  # zero kept lines < min_lines
    assert out[2]["n_lines_kept"] == 1


def test_line_dedup_keep_first_and_normalization(spark):
    rows = [
        (1, "alpha one\nShared   Line\ntail"),
        (2, "beta two\nshared line\nother tail"),
        (3, "gamma\nSHARED LINE\nanother"),
    ]
    out = {r["doc_id"]: r for r in
           line_dedup(_docs(spark, rows)).collect()}
    # doc 1 holds the globally-first occurrence, ORIGINAL text kept
    assert out[1]["clean_text"] == "alpha one\nShared   Line\ntail"
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["clean_text"] == "beta two\nother tail"
    assert out[2]["n_lines_removed"] == 1
    assert out[3]["clean_text"] == "gamma\nanother"
    assert out[3]["n_lines_removed"] == 1


def test_line_dedup_within_doc_and_blanks(spark):
    # duplicate INSIDE one doc: second occurrence excised; blank
    # lines are structure — never deduped, all preserved
    rows = [(7, "same line\n\nsame line\n\nend.")]
    out = line_dedup(_docs(spark, rows)).collect()[0]
    assert out["clean_text"] == "same line\n\n\nend."
    assert out["n_lines"] == 5
    assert out["n_lines_removed"] == 1


def test_line_dedup_no_normalize_mode(spark):
    rows = [(1, "Case Line"), (2, "case line")]
    out = {r["doc_id"]: r["n_lines_removed"] for r in
           line_dedup(_docs(spark, rows), normalize=False).collect()}
    assert out == {1: 0, 2: 0}  # different bytes => both survive
