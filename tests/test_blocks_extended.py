"""Round-2 block-model extensions: TABLE/CELL structure blocks,
SELECTION_ELEMENT checkboxes, the typed error taxonomy, review
ingestion hygiene (P10/P11 as real code paths) and the optional review
``tax`` field.

Reference parity targets: FeatureTypes=["FORMS","TABLES"]
(fn-call-textract/main.py:53-61), the checkbox review template
(a2i-text-with-checkboxes.liquid.html:40-69), the error taxonomy
(fn-preprocess/main.py:22-29, fn-human-review-callback/main.py:24-30)
and the callback's suffix/token guards (main.py:46-59).
"""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from textract_demo_spark.core.blocks import (
    CELL, NOT_SELECTED, SELECTED, SELECTION_ELEMENT,
    STATUS_MALFORMED, STATUS_MODEL_ERROR, STATUS_OK, STATUS_REJECTED,
    TABLE)
from textract_demo_spark.core.extract import extract_payload
from textract_demo_spark.core.html_extract import extract_html


# --- TABLE / CELL -----------------------------------------------------------

TABLE_HTML = ('<html><body><div class="content"><p>Corner Store</p>'
              '<table><tr><th>Item</th><th>Qty</th><th>Price</th></tr>'
              '<tr><td>Tea</td><td>2</td><td>$4.50</td></tr>'
              '<tr><td>Scone</td><td>1</td><td>$3.25</td></tr></table>'
              '</div></body></html>')


def test_table_cells_grid():
    res = extract_html(TABLE_HTML)
    cells = [b for b in res.blocks if b["block_type"] == CELL]
    grid = {(b["row_idx"], b["col_idx"]): b["text"] for b in cells}
    assert grid == {
        (0, 0): "Item", (0, 1): "Qty", (0, 2): "Price",
        (1, 0): "Tea", (1, 1): "2", (1, 2): "$4.50",
        (2, 0): "Scone", (2, 1): "1", (2, 2): "$3.25"}
    # cell spans index back into the raw payload
    for b in cells:
        assert TABLE_HTML[b["char_start"]:b["char_end"]] == b["text"]
    tables = [b for b in res.blocks if b["block_type"] == TABLE]
    assert len(tables) == 1
    assert (tables[0]["row_idx"], tables[0]["col_idx"]) == (3, 3)
    # structure blocks never pollute main_text
    assert "Tea" in res.main_text  # via the LINE path
    assert all(not b["is_content"] for b in cells + tables)


def test_nested_tables_get_separate_ids():
    html = ('<html><body><table><tr><td>outer'
            '<table><tr><td>inner</td></tr></table>'
            '</td></tr></table></body></html>')
    res = extract_html(html)
    cells = [b for b in res.blocks if b["block_type"] == CELL]
    assert {b["text"] for b in cells} == {"outer", "inner"}
    tables = [b for b in res.blocks if b["block_type"] == TABLE]
    assert len(tables) == 2


def test_table_missing_tr_is_tolerated():
    # td outside any tr: no cell annotation, no crash, text still a LINE
    html = "<html><body><table><td>stray</td></table></body></html>"
    res = extract_html(html)
    assert not [b for b in res.blocks if b["block_type"] == CELL]
    assert any(b["text"] == "stray" for b in res.blocks
               if b["block_type"] == "LINE")


def _min_pdf(ops: list[str]) -> bytes:
    """Minimal single-page uncompressed PDF around the given content
    ops (same scaffolding shape as the fixture builder)."""
    content = "\n".join(ops).encode("latin-1")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj\n",
        (f"4 0 obj << /Length {len(content)} >> stream\n").encode()
        + content + b"\nendstream endobj\n",
    ]
    out = bytearray(b"%PDF-1.4\n")
    for o in objs:
        out.extend(o)
    out.extend(b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
    return bytes(out)


def test_pdf_geometry_table_cells():
    """Aligned multi-column lines in a PDF become a TABLE + CELL grid;
    spans are main_text-domain (the PDF span convention)."""
    from textract_demo_spark.core.pdf_extract import extract_pdf
    ops = ["BT /F1 12 Tf 72 740 Td (Receipt Header) Tj ET"]
    grid = [["Item", "Qty", "Price"],
            ["Tea", "2", "$4.50"],
            ["Scone", "1", "$3.25"]]
    xs = [72, 300, 430]
    for ri, row in enumerate(grid):
        y = 700 - 20 * ri
        for x, txt in zip(xs, row):
            ops.append(f"BT /F1 12 Tf {x} {y} Td ({txt}) Tj ET")
    res = extract_pdf(_min_pdf(ops))
    assert res.status == "ok"
    cells = [b for b in res.blocks if b["block_type"] == CELL]
    got = {(b["row_idx"], b["col_idx"]): b["text"] for b in cells}
    assert got == {(ri, ci): txt for ri, row in enumerate(grid)
                   for ci, txt in enumerate(row)}
    for b in cells:  # spans slice out of main_text (span_domain)
        assert res.main_text[b["char_start"]:b["char_end"]] == b["text"]
    tables = [b for b in res.blocks if b["block_type"] == TABLE]
    assert len(tables) == 1
    assert (tables[0]["row_idx"], tables[0]["col_idx"]) == (3, 3)
    # the header line (single run) is not part of the grid
    assert "Receipt Header" in res.main_text


def test_pdf_misaligned_columns_are_not_a_table():
    from textract_demo_spark.core.pdf_extract import extract_pdf
    ops = [
        "BT /F1 12 Tf 72 740 Td (alpha) Tj ET",
        "BT /F1 12 Tf 300 740 Td (beta) Tj ET",
        "BT /F1 12 Tf 90 720 Td (gamma) Tj ET",   # x-start shifted
        "BT /F1 12 Tf 350 720 Td (delta) Tj ET",
    ]
    res = extract_pdf(_min_pdf(ops))
    assert not [b for b in res.blocks if b["block_type"] == TABLE]


# --- SELECTION_ELEMENT ------------------------------------------------------

def test_selection_elements_states_and_spans():
    html = ('<html><body><div class="content"><p>Vendor Co</p>'
            '<p>[x] Tax included</p><p>[ ] Gift receipt</p>'
            '<p>[X] Signed</p></div></body></html>')
    res = extract_html(html)
    sels = [b for b in res.blocks if b["block_type"] == SELECTION_ELEMENT]
    assert [b["selection_status"] for b in sels] == [
        SELECTED, NOT_SELECTED, SELECTED]
    for b in sels:
        assert html[b["char_start"]:b["char_end"]] == b["text"]
        assert not b["is_content"]


def test_selection_detected_even_on_boilerplate_lines():
    # short checkbox rows often score below the content threshold;
    # selection elements must still be reported (Textract emits them
    # independently of text relevance)
    html = ('<html><body><nav>[x] opt</nav>'
            '<div class="content"><p>Some real content line here</p>'
            '</div></body></html>')
    res = extract_html(html)
    sels = [b for b in res.blocks if b["block_type"] == SELECTION_ELEMENT]
    assert len(sels) == 1 and sels[0]["selection_status"] == SELECTED


# --- typed error taxonomy ---------------------------------------------------

def test_taxonomy_rejected_vs_malformed_vs_model_error():
    assert extract_payload("").status == STATUS_REJECTED
    assert extract_payload("<html><p>truncated").status == STATUS_REJECTED
    # broken base64 envelope => malformed (MalformedRequest analog)
    assert (extract_payload("data:application/pdf;base64,!!!").status
            == STATUS_MALFORMED)
    # decodes + sniffs as PDF but not-a-PDF content => rejected
    not_pdf = ("data:application/pdf;base64,"
               + base64.b64encode(b"plain bytes, no marker").decode())
    assert extract_payload(not_pdf).status == STATUS_REJECTED
    # valid envelope, PDF magic, but a corrupt Flate stream => the
    # extractor fails AFTER the gate => model_error, kind pdf
    bad_flate = ("data:application/pdf;base64,"
                 + base64.b64encode(
                     b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode"
                     b" /Length 8 >> stream\nNOTZLIB!\nendstream endobj\n"
                     b"%%EOF\n").decode())
    res = extract_payload(bad_flate)
    assert (res.status, res.kind) == (STATUS_MODEL_ERROR, "pdf")
    # sanity: good payloads still ok
    assert extract_payload("hello world").status == STATUS_OK


# --- review ingestion hygiene + tax (Spark) --------------------------------

def _raw_reviews(spark):
    from textract_demo_spark.engine.schemas import RAW_REVIEWS_SCHEMA
    rows = [
        # P10: non-.json source => dropped silently
        ("export.csv", "tok-1", "c1", 0, "V", "2020-01-01", "1.00",
         None, "w-1", None),
        # P11: no task token => dropped silently
        (None, None, "c2", 0, "V", "2020-01-01", "1.00",
         None, "w-1", None),
        # malformed answers (no worker) => review_failed
        ("a.json", "tok-3", "c3", 0, "V", "2020-01-01", "1.00",
         None, None, None),
        # all answers null => review_failed
        ("b.json", "tok-4", "c4", 0, None, None, None,
         None, "w-9", None),
        # clean row with a tax answer => valid override
        ("c.json", "tok-5", "c5", 0, "Vendor Co", "2020-07-07", "64.30",
         "5.85", "w-2", None),
        # clean row without tax => valid, tax empty in the override
        ("d.json", "tok-6", "c6", 0, "Other Co", "2021-01-01", "9.99",
         None, "w-3", None),
    ]
    return spark.createDataFrame(rows, schema=RAW_REVIEWS_SCHEMA)


def test_ingest_reviews_hygiene(spark):
    from textract_demo_spark.engine.review import ingest_reviews
    valid, failed = ingest_reviews(_raw_reviews(spark))
    assert {r["conv_id"] for r in valid.collect()} == {"c5", "c6"}
    assert {r["conv_id"] for r in failed.collect()} == {"c3", "c4"}


def test_apply_reviews_failed_and_tax(spark):
    from textract_demo_spark.engine.review import (apply_reviews,
                                                   ingest_reviews)
    valid, failed = ingest_reviews(_raw_reviews(spark))
    results = spark.createDataFrame(
        [(f"c{i}", 0, "ok") for i in range(1, 7)],
        "conv_id string, turn_idx int, status string"
    ).withColumn("model_result", F.expr("""cast(null AS struct<
        date:struct<confidence:double,value:string>,
        total:struct<confidence:double,value:string>,
        vendor:struct<confidence:double,value:string>,
        confidence:double>)"""))
    out = {r["conv_id"]: r.asDict(recursive=True)
           for r in apply_reviews(results, valid,
                                  failed_reviews=failed).collect()}
    # dropped rows leave the turn untouched
    assert out["c1"]["status"] == "ok" and not out["c1"]["reviewed"]
    assert out["c2"]["status"] == "ok" and not out["c2"]["reviewed"]
    # malformed answers fail the turn (ReviewFailed analog)
    assert out["c3"]["status"] == "review_failed"
    assert out["c4"]["status"] == "review_failed"
    # valid overrides: tax present => conf 100, absent => conf 0
    c5 = out["c5"]["final_result"]
    assert c5["tax"] == {"confidence": 100.0, "value": "5.85"}
    assert c5["vendor"]["value"] == "Vendor Co"
    c6 = out["c6"]["final_result"]
    assert c6["tax"] == {"confidence": 0.0, "value": ""}
    assert out["c5"]["status"] == "ok" and out["c5"]["reviewed"]


def test_run_pipeline_with_raw_reviews(spark):
    """Pipeline-level wiring of the unhygienic review feed: valid rows
    override, answer-less rows fail their turn, junk rows are dropped."""
    from textract_demo_spark.engine.pipeline import (fixtures_to_dfs,
                                                     run_pipeline)
    from textract_demo_spark.engine.schemas import RAW_REVIEWS_SCHEMA
    dfs = fixtures_to_dfs(spark, n_convs=6)
    ok_turns = [r for r in dfs["fixtures"]["expected_turns"]
                if r["status"] == "ok"][:3]
    (c0, t0), (c1, t1), (c2, t2) = [(r["conv_id"], r["turn_idx"])
                                    for r in ok_turns]
    raw = spark.createDataFrame([
        ("a.json", "tok-1", c0, t0, "Vendor A", "2020-01-01", "1.00",
         None, "w-1", None),                      # valid override
        ("b.json", "tok-2", c1, t1, "V", None, None,
         None, None, None),                       # no worker => failed
        ("c.txt", "tok-3", c2, t2, "V", "2020-01-01", "1.00",
         None, "w-3", None),                      # non-.json => dropped
    ], schema=RAW_REVIEWS_SCHEMA)
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in run_pipeline(dfs["transcripts"],
                                 raw_reviews=raw, salt=2).collect()}
    assert out[(c0, t0)]["reviewed"] and out[(c0, t0)]["status"] == "ok"
    assert out[(c0, t0)]["final_result"]["vendor"]["value"] == "Vendor A"
    assert out[(c1, t1)]["status"] == "review_failed"
    assert not out[(c2, t2)]["reviewed"]
    assert out[(c2, t2)]["status"] == "ok"


# --- PAGE + derived WORD blocks --------------------------------------------

def test_page_blocks_emitted_per_kind():
    from textract_demo_spark.core.pdf_extract import extract_pdf
    html = extract_html('<html><body><p>Hello world</p></body></html>')
    pages = [b for b in html.blocks if b["block_type"] == "PAGE"]
    assert len(pages) == 1 and pages[0]["page"] == 1
    plain = extract_payload("just some text")
    assert [b["block_type"] for b in plain.blocks][:1] == ["PAGE"]
    pdf = extract_pdf(_min_pdf(
        ["BT /F1 12 Tf 72 740 Td (Line one) Tj ET"]))
    pdf_pages = [b for b in pdf.blocks if b["block_type"] == "PAGE"]
    assert len(pdf_pages) == 1
    # PAGE blocks never contribute content
    assert all(not b["is_content"] for b in pages + pdf_pages)


def test_words_table_offsets_slice_line_text(spark):
    from textract_demo_spark.engine.udfs import extract_turns, words_table
    turns = spark.createDataFrame(
        [("c1", 0, "user", "alpha beta  gamma", "", None)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    words = words_table(extract_turns(turns, salt=2)).collect()
    line = "alpha beta  gamma"  # double space => empty word preserved
    assert [w["word"] for w in words] == ["alpha", "beta", "", "gamma"]
    for w in words:
        assert line[w["word_start"]:w["word_end"]] == w["word"]
