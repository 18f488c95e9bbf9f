"""From-scratch minimal PDF layout analyzer (fixture-grade PDFs).

Replaces the reference's Textract FORMS/TABLES call
(``source/ocr/textract-integration/fn-call-textract/main.py:53-61``)
for PDF payloads: parses the object graph of small single-generation
PDFs (uncompressed or FlateDecode content streams via stdlib zlib),
interprets the text-positioning/text-showing operators
(BT/ET/Tf/Td/TD/Tm/TL/T*/Tj/TJ), clusters glyph runs into lines by y,
sorts lines into reading order (-y, then x), and detects key-value
pairs from two-column geometry (x-gap) or same-line ``key: value``
text — mirroring what fn-postprocess consumes from the trp form model
(``source/ocr/postprocessing/fn-postprocess/main.py:64-99``).

Span domain: PDF payloads arrive base64-encoded in the ``text``
column, so raw-payload offsets are meaningless; spans index into the
extracted ``main_text`` instead (ExtractResult.span_domain ==
"main_text"). Pure Python + stdlib zlib. No Spark imports.
"""

from __future__ import annotations

import re
import zlib

from .blocks import (CELL, KEY, KEY_VALUE, LINE, PAGE, TABLE, VALUE,
                     ExtractResult, make_block)
from .confidence import line_confidence
from .html_extract import split_key_value

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# delimiter fallback: per spec the stream data is followed by ONE EOL
# then 'endstream' — strip at most that EOL, never \s* (binary data
# legitimately ends in whitespace-class bytes; hypothesis found a
# Flate stream ending in 0x09 that \s* truncated)
_STREAM_END_RE = re.compile(rb"(.*?)\r?\n?endstream", re.S)
_ENDSTREAM_NEAR_RE = re.compile(rb"\s{0,4}endstream")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
# (?!\s+\d+\s+R) rejects indirect length refs ('/Length 5 0 R' would
# otherwise yield n=5 and rest on the endstream-follows guard alone);
# indirect refs take the delimiter fallback instead
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")

Y_TOLERANCE = 2.0
COLUMN_GAP = 30.0  # gap (pts) between estimated run end and next run => column split
CHAR_WIDTH_EM = 0.6  # crude Helvetica-ish average advance per char
TABLE_ALIGN_TOL = 2.0  # column x-start alignment tolerance (pts)


class PdfParseError(ValueError):
    pass


def _content_streams(data: bytes) -> list[bytes]:
    """All decoded content streams, in object order.

    Tolerant object scan rather than a strict xref walk: fixture-grade
    single-generation PDFs always match, and damaged xref tables don't
    take the whole document down (the quality gate upstream already
    rejected non-PDF payloads)."""
    streams: list[bytes] = []
    for m in _OBJ_RE.finditer(data):
        body = m.group(3)
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            continue
        header = body[: sm.start()]
        raw = None
        lm = _LENGTH_RE.search(header)
        if lm:
            # spec path: /Length is authoritative — slice from the
            # FULL buffer (binary-safe: immune both to whitespace
            # trailing bytes and to 'endobj'/'endstream' appearing
            # inside compressed data, which would truncate any
            # delimiter scan); trust it only if 'endstream' actually
            # follows the slice
            n = int(lm.group(1))
            abs_start = m.start(3) + sm.end()
            cand = data[abs_start:abs_start + n]
            if (len(cand) == n and
                    _ENDSTREAM_NEAR_RE.match(data, abs_start + n)):
                raw = cand
        if raw is None:
            em = _STREAM_END_RE.match(body, sm.end())
            if em is None:
                continue
            raw = em.group(1)
        if _FLATE_RE.search(header):
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise PdfParseError(f"bad Flate stream: {exc}") from exc
        if b"BT" in raw:
            streams.append(raw)
    return streams


def _decode_pdf_string(tok: bytes) -> str:
    """Decode a (...) PDF string literal body (escapes + octal)."""
    out: list[str] = []
    i = 0
    n = len(tok)
    while i < n:
        b = tok[i]
        if b == 0x5C and i + 1 < n:  # backslash
            nxt = tok[i + 1]
            esc = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b",
                   0x66: "\f", 0x28: "(", 0x29: ")", 0x5C: "\\"}
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal \ddd
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= tok[j] <= 0x37:
                    oct_digits.append(chr(tok[j]))
                    j += 1
                out.append(chr(int("".join(oct_digits), 8)))
                i = j
                continue
            i += 1  # unknown escape: drop the backslash
            continue
        out.append(chr(b))
        i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # string literal
    rb"|\[|\]"                      # array delims (TJ)
    rb"|<<|>>"                      # dict delims (before hex: << wins)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string literal
    rb"|/[^\s\[\]()<>/]*"          # name
    rb"|[-+]?\d*\.?\d+"            # number
    rb"|[A-Za-z'\"*]+",            # operator
)


def _decode_pdf_hex(tok: bytes) -> str:
    """Decode a <...> PDF hex string body (whitespace ignored; an odd
    final digit is padded with 0 per spec 7.3.4.3). Bytes map to the
    same latin-1 code points as literal strings."""
    digits = re.sub(rb"\s+", b"", tok[1:-1])
    if len(digits) % 2:
        digits += b"0"
    return "".join(chr(b) for b in bytes.fromhex(digits.decode("ascii")))


class _Run:
    __slots__ = ("x", "y", "text", "size")

    def __init__(self, x: float, y: float, text: str, size: float):
        self.x = x
        self.y = y
        self.text = text
        self.size = size

    @property
    def x_end(self) -> float:
        return self.x + CHAR_WIDTH_EM * self.size * len(self.text)


def _interpret(stream: bytes) -> list[_Run]:
    """Interpret text operators; emit positioned glyph runs."""
    runs: list[_Run] = []
    stack: list = []
    x = y = 0.0
    size = 12.0
    leading = 14.0
    in_array = False
    array_strings: list[str] = []
    for m in _TOKEN_RE.finditer(stream):
        tok = m.group(0)
        if tok.startswith(b"(") or (tok.startswith(b"<") and tok != b"<<"):
            s = (_decode_pdf_string(tok[1:-1]) if tok.startswith(b"(")
                 else _decode_pdf_hex(tok))
            if in_array:
                array_strings.append(s)
            else:
                stack.append(("str", s))
            continue
        if tok == b"[":
            in_array = True
            array_strings = []
            continue
        if tok == b"]":
            in_array = False
            stack.append(("str", "".join(array_strings)))
            continue
        if tok in (b"<<", b">>") or tok.startswith(b"/"):
            stack.append(("name", tok))
            continue
        try:
            stack.append(("num", float(tok)))
            continue
        except ValueError:
            pass
        op = tok
        if op == b"BT":
            x = y = 0.0
            stack.clear()
        elif op == b"ET":
            stack.clear()
        elif op == b"Tf":
            if stack and stack[-1][0] == "num":
                size = float(stack[-1][1])
                leading = 1.2 * size
            stack.clear()
        elif op in (b"Td", b"TD"):
            if len(stack) >= 2 and stack[-1][0] == "num" and stack[-2][0] == "num":
                tx, ty = stack[-2][1], stack[-1][1]
                x += tx
                y += ty
                if op == b"TD":
                    leading = -ty if ty else leading
            stack.clear()
        elif op == b"Tm":
            if len(stack) >= 6:
                nums = [v for k, v in stack[-6:] if k == "num"]
                if len(nums) == 6:
                    x, y = nums[4], nums[5]
            stack.clear()
        elif op == b"TL":
            if stack and stack[-1][0] == "num":
                leading = float(stack[-1][1])
            stack.clear()
        elif op == b"T*":
            y -= leading
            stack.clear()
        elif op in (b"Tj", b"TJ", b"'", b'"'):
            if op in (b"'", b'"'):  # both move to next line first
                y -= leading
            if stack and stack[-1][0] == "str":
                s = stack[-1][1]
                if s.strip():
                    runs.append(_Run(x, y, s, size))
                # crude advance so consecutive Tj on one line keep order
                x += CHAR_WIDTH_EM * size * len(s)
            stack.clear()
        else:
            stack.clear()
    return runs


def extract_pdf(data: bytes) -> ExtractResult:
    """Extract lines/KV blocks from PDF bytes."""
    if not data.startswith(b"%PDF"):
        raise PdfParseError("not a PDF (missing %PDF header)")
    runs: list[tuple[_Run, int]] = []
    for page, stream in enumerate(_content_streams(data), start=1):
        runs.extend((r, page) for r in _interpret(stream))

    # cluster runs into lines by (page, y within tolerance)
    clusters: list[dict] = []
    for r, page in runs:
        placed = False
        for c in clusters:
            if c["page"] == page and abs(c["y"] - r.y) <= Y_TOLERANCE:
                c["runs"].append(r)
                placed = True
                break
        if not placed:
            clusters.append({"page": page, "y": r.y, "runs": [r]})
    # reading order: page asc, y desc (PDF origin is bottom-left), x asc
    clusters.sort(key=lambda c: (c["page"], -c["y"]))
    for c in clusters:
        c["runs"].sort(key=lambda r: r.x)

    blocks: list[dict] = []
    texts: list[str] = []
    spans: list[tuple[int, int]] = []
    bid = 0
    kv_gid = 0
    offset = 0
    # per-line geometry + char spans of each run, for the table
    # detection post-pass: (page, runs, [per-run (start, end)], y)
    line_meta: list[tuple[int, list[_Run], list[tuple[int, int]], float]] = []
    for order, c in enumerate(clusters):
        rs: list[_Run] = c["runs"]
        # detect a column split: large x-gap between consecutive runs
        split_at = None
        for i in range(1, len(rs)):
            if rs[i].x - rs[i - 1].x_end > COLUMN_GAP:
                split_at = i
                break
        text = " ".join(r.text for r in rs)
        start = offset
        end = start + len(text)
        offset = end + 1  # '\n' joiner
        run_spans = []
        off_in = 0
        for r in rs:
            run_spans.append((start + off_in, start + off_in + len(r.text)))
            off_in += len(r.text) + 1
        line_meta.append((c["page"], rs, run_spans, c["y"]))
        x0 = rs[0].x
        x1 = max(r.x_end for r in rs)
        y1 = c["y"] + rs[0].size
        blocks.append(make_block(
            bid, LINE, text, start, end, line_confidence(text),
            page=c["page"], x0=x0, y0=c["y"], x1=x1, y1=y1,
            reading_order=order, is_content=True))
        bid += 1
        texts.append(text)
        spans.append((start, end))

        key = value = None
        if split_at is not None:
            key = " ".join(r.text for r in rs[:split_at]).strip()
            value = " ".join(r.text for r in rs[split_at:]).strip()
            if key.endswith(":"):
                key = key[:-1].rstrip()
        else:
            kv = split_key_value(text)
            if kv is not None:
                key, value = kv
        if key and value:
            k_start = start
            k_end = start + len(" ".join(r.text for r in rs[: split_at or 1])) \
                if split_at is not None else start + text.find(":")
            v_start = end - len(value)
            blocks.append(make_block(
                bid, KEY_VALUE, key, k_start, k_end, line_confidence(key),
                page=c["page"], x0=x0, y0=c["y"],
                x1=rs[(split_at or 1) - 1].x_end, y1=y1,
                kv_role=KEY, kv_group_id=kv_gid))
            bid += 1
            blocks.append(make_block(
                bid, KEY_VALUE, value, v_start, end, line_confidence(value),
                page=c["page"], x0=rs[split_at].x if split_at else x0,
                y0=c["y"], x1=x1, y1=y1,
                kv_role=VALUE, kv_group_id=kv_gid))
            bid += 1
            kv_gid += 1

    # PAGE blocks (Block-model parity): one per page, spanning that
    # page's lines in the main_text domain
    by_page: dict[int, list[tuple[int, int]]] = {}
    for (pg, _, rsp, _), sp in zip(line_meta, spans):
        by_page.setdefault(pg, []).append(sp)
    for pg in sorted(by_page):
        sps = by_page[pg]
        blocks.append(make_block(
            bid, PAGE, "", min(s[0] for s in sps), max(s[1] for s in sps),
            100.0, page=pg, is_content=False))
        bid += 1

    # --- geometry-grid table detection (TABLE/CELL analog of
    # FeatureTypes=["FORMS","TABLES"], fn-call-textract/main.py:53-61):
    # >= 2 consecutive lines on one page whose multi-run column starts
    # align within TABLE_ALIGN_TOL form a table region; each aligned
    # run is a CELL with its (row, col) grid position. Char spans are
    # main_text-domain (the PDF span domain), so CELL text slices out
    # of main_text exactly. KV pairs emitted above are unaffected —
    # like Textract, a two-column form region can carry both FORMS
    # and TABLES structure.
    regions: list[list[tuple]] = []
    cur: list[tuple] = []
    for meta in line_meta:
        page, rs, run_spans, y = meta
        multi = len(rs) >= 2
        if (multi and cur
                and page == cur[-1][0]
                and len(rs) == len(cur[-1][1])
                and all(abs(a.x - b.x) <= TABLE_ALIGN_TOL
                        for a, b in zip(rs, cur[-1][1]))):
            cur.append(meta)
            continue
        if len(cur) >= 2:
            regions.append(cur)
        cur = [meta] if multi else []
    if len(cur) >= 2:
        regions.append(cur)
    for region in regions:
        cell_confs = [line_confidence(r.text)
                      for _, rs, _, _ in region for r in rs]
        t_start = min(sp[0] for _, _, rsp, _ in region for sp in rsp)
        t_end = max(sp[1] for _, _, rsp, _ in region for sp in rsp)
        blocks.append(make_block(
            bid, TABLE, "", t_start, t_end, min(cell_confs),
            page=region[0][0],
            x0=min(r.x for _, rs, _, _ in region for r in rs),
            y0=min(y for _, _, _, y in region),
            x1=max(r.x_end for _, rs, _, _ in region for r in rs),
            y1=max(y for _, _, _, y in region) + region[0][1][0].size,
            is_content=False,
            row_idx=len(region), col_idx=len(region[0][1])))
        bid += 1
        for ri, (page, rs, rsp, y) in enumerate(region):
            for ci, (r, sp) in enumerate(zip(rs, rsp)):
                blocks.append(make_block(
                    bid, CELL, r.text, sp[0], sp[1],
                    line_confidence(r.text), page=page,
                    x0=r.x, y0=y, x1=r.x_end, y1=y + r.size,
                    is_content=False, row_idx=ri, col_idx=ci))
                bid += 1

    return ExtractResult(
        status="ok", kind="pdf",
        main_text="\n".join(texts), spans=spans, blocks=blocks,
        span_domain="main_text")
