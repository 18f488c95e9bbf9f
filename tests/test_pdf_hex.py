"""PDF hex-string literals (<...>) and the quote text-showing operators.

Spec parity: PDF 32000-1 7.3.4.3 (hexadecimal strings — whitespace
ignored, odd final digit padded with 0) and 9.4.3 (' and " move to the
next line before showing). The reference's Textract path consumes
rendered text only, so these are decoder-level parity targets for real
generator output (many producers emit hex strings exclusively).
"""

from __future__ import annotations

import base64
import zlib

from textract_demo_spark.core.pdf_extract import (
    _decode_pdf_hex, _interpret, extract_pdf)


def test_hex_decode_basic():
    assert _decode_pdf_hex(b"<48656C6C6F>") == "Hello"


def test_hex_decode_whitespace_and_odd_padding():
    # whitespace anywhere is ignored; odd trailing digit pads with 0:
    # <48 65 6C 6C 6F 2> == 48656C6C6F20 == "Hello "
    assert _decode_pdf_hex(b"<48 65\n6C\t6C 6F 2>") == "Hello "


def test_hex_decode_empty():
    assert _decode_pdf_hex(b"<>") == ""


def test_interpret_hex_tj():
    runs = _interpret(b"BT /F1 12 Tf 72 700 Td <486921> Tj ET")
    assert [(r.text, r.x, r.y) for r in runs] == [("Hi!", 72.0, 700.0)]


def test_interpret_hex_in_tj_array():
    # mixed literal + hex segments concatenate within one TJ show
    runs = _interpret(
        b"BT /F1 12 Tf 72 700 Td [(Total) -250 <3A2033322E3530>] TJ ET")
    assert [r.text for r in runs] == ["Total: 32.50"]


def test_interpret_dict_delims_not_hex():
    # << >> must still tokenize as dict delimiters, not hex strings
    runs = _interpret(b"BT << /Foo 1 >> /F1 12 Tf 72 700 Td (x) Tj ET")
    assert [r.text for r in runs] == ["x"]


def test_interpret_quote_operator_advances_line():
    # ' shows on the next line; " takes (aw ac string) and does the same
    runs = _interpret(
        b"BT /F1 12 Tf 2 14 TL 72 700 Td (first) Tj "
        b"(second) ' 0.5 0.1 (third) \" ET")
    assert [(r.text, r.y) for r in runs] == [
        ("first", 700.0), ("second", 686.0), ("third", 672.0)]


def _wrap_pdf(content: bytes, flate: bool = False) -> bytes:
    body = zlib.compress(content) if flate else content
    filt = b"/Filter /FlateDecode " if flate else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj\n"
        + b"4 0 obj << " + filt
        + b"/Length " + str(len(body)).encode() + b" >> stream\n"
        + body + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n")


def test_extract_pdf_hex_end_to_end():
    content = (b"BT /F1 12 Tf 72 740 Td <436F726E65722053746F7265> Tj ET\n"
               b"BT /F1 12 Tf 72 720 Td (Total: 12.00) Tj ET")
    res = extract_pdf(_wrap_pdf(content, flate=True))
    lines = [b["text"] for b in res.blocks if b["block_type"] == "LINE"]
    assert lines == ["Corner Store", "Total: 12.00"]
    # spans index into main_text
    assert res.main_text.startswith("Corner Store")


def test_extract_pdf_hex_base64_payload_roundtrip():
    content = b"BT /F1 12 Tf 72 740 Td <48656C6C6F20504446> Tj ET"
    raw = _wrap_pdf(content)
    payload = ("data:application/pdf;base64,"
               + base64.b64encode(raw).decode())
    # decode path used by the pipeline
    from textract_demo_spark.core.quality import decode_pdf_payload
    data = decode_pdf_payload(payload)
    res = extract_pdf(data)
    assert res.main_text == "Hello PDF"
