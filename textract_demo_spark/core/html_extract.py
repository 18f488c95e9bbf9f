"""From-scratch HTML main-content extractor with char-span tracking.

Replaces the reference's Textract OCR call
(``source/ocr/textract-integration/fn-call-textract/main.py:53-61``)
for HTML payloads: a hand-written tag tokenizer builds a flat stream
of text segments annotated with boilerplate context, segments are
grouped into visual lines (one per block-level element), and each
line is classified content vs boilerplate with a Boilerpipe-style
text/link-density score plus Arc90/readability class-id hints.

Char spans (``char_start``/``char_end``) are Python-str indices into
the ORIGINAL payload string, trimmed to the first/last non-whitespace
character of each line's raw source region — the invariant the golden
fixtures assert per turn (BASELINE.json north rule: per-turn text +
span equality under stable (conv_id, turn_idx) ordering).

Pure Python, stdlib only. No Spark imports.
"""

from __future__ import annotations

import re

from .blocks import (CELL, KEY, KEY_VALUE, LINE, NOT_SELECTED, PAGE,
                     SELECTED, SELECTION_ELEMENT, TABLE, VALUE,
                     ExtractResult, make_block)
from .confidence import line_confidence

# --- tokenizer tables ------------------------------------------------------

VOID_TAGS = {
    "br", "img", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}
# Block-level boundaries: a new instance of any of these starts a new line.
BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "table", "tr", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "section", "article", "main", "aside", "nav",
    "header", "footer", "form", "blockquote", "pre", "dl", "dt", "dd",
    "figure", "figcaption", "body", "html", "title", "caption",
}
# Structural boilerplate zones (anything inside is presumed chrome).
NEG_TAGS = {"nav", "aside", "footer", "form", "head", "title", "button",
            "select", "option", "script", "style", "noscript"}
POS_TAGS = {"main", "article"}

NEG_HINT_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|sidebar|side|footer|header|banner|ads?|promo|"
    r"comment|widget|breadcrumb|related|share|social|copyright|masthead|"
    r"skyscraper|sponsor)(?:$|[\s_-])", re.I)
POS_HINT_RE = re.compile(
    r"(?:^|[\s_-])(content|main|article|post|text|receipt|invoice|entry|"
    r"story|page-body)(?:$|[\s_-])", re.I)

_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:-]*")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")
_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")
_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "mdash": "—", "ndash": "–",
    "hellip": "…", "trade": "™", "reg": "®", "deg": "°",
    "eacute": "é", "egrave": "è", "agrave": "à", "ccedil": "ç",
    "uuml": "ü", "ouml": "ö", "auml": "ä", "ntilde": "ñ",
    "pound": "£", "euro": "€", "yen": "¥", "cent": "¢",
    "laquo": "«", "raquo": "»", "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”", "bull": "•", "middot": "·",
}
_WS_RE = re.compile(r"\s+")
_DIGIT_RE = re.compile(r"\d")
# raw-content close tags, precompiled (only two names exist; compiling
# per <script>/<style> occurrence showed up in the kernel profile)
_RAW_CLOSE_RE = {name: re.compile(r"</" + name + r"\s*>", re.I)
                 for name in ("script", "style")}


def _unescape(s: str) -> str:
    if "&" not in s:  # hot path: most text nodes carry no entities
        return s

    def repl(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _NAMED_ENTITIES.get(body, m.group(0))
    return _ENTITY_RE.sub(repl, s)


# --- tokenizer -------------------------------------------------------------

class _Seg:
    __slots__ = ("text", "start", "end", "raw_len", "link_chars",
                 "neg", "pos", "block_iid", "cell")

    def __init__(self, text, start, end, raw_len, link_chars, neg, pos,
                 block_iid, cell=None):
        self.text = text
        self.start = start
        self.end = end
        self.raw_len = raw_len
        self.link_chars = link_chars
        self.neg = neg
        self.pos = pos
        self.block_iid = block_iid
        self.cell = cell  # (table_id, row_idx, col_idx) inside a td/th


def _tokenize(s: str) -> list[_Seg]:
    """Single pass over the raw HTML, emitting trimmed text segments
    with their raw-source offsets and boilerplate context."""
    segs: list[_Seg] = []
    n = len(s)
    i = 0
    # Context stack: (tag, neg_delta, pos_delta, link_delta, block_iid_at_open)
    stack: list[tuple[str, int, int, int]] = []
    neg_depth = 0
    pos_depth = 0
    link_depth = 0
    block_iid = 0  # bumped on every block-level open/close and <br>
    # table-structure context (TABLE/CELL analog of the FORMS+TABLES
    # feature request, fn-call-textract/main.py:53-61): innermost
    # table's [table_id, row_idx, col_idx]
    table_stack: list[list[int]] = []
    table_count = 0
    cell_depth = 0  # inside a td/th

    def classify_attrs(attrs: str) -> tuple[bool, bool]:
        # fast path: the full attr parse only matters if a class/id/
        # role attribute can exist at all; a plain substring probe is
        # a safe gate (false positives like width= just fall through
        # to the exact name check below)
        if ("class" not in attrs and "id" not in attrs
                and "role" not in attrs):
            return False, False
        neg = pos = False
        for m in _ATTR_RE.finditer(attrs):
            name = m.group(1).lower()
            if name in ("class", "id", "role"):
                val = m.group(3) or m.group(4) or m.group(5) or ""
                if NEG_HINT_RE.search(val):
                    neg = True
                if POS_HINT_RE.search(val):
                    pos = True
        return neg, pos

    while i < n:
        c = s[i]
        if c == "<":
            # single-char dispatch on the char after '<' (the hot loop
            # ran 3 startswith probes per tag before)
            c2 = s[i + 1] if i + 1 < n else ""
            if c2 == "!" or c2 == "?":
                if s.startswith("<!--", i):
                    j = s.find("-->", i + 4)
                    i = n if j == -1 else j + 3
                    continue
                j = s.find(">", i)
                i = n if j == -1 else j + 1
                continue
            if c2 == "/":
                j = s.find(">", i)
                if j == -1:
                    break  # truncated
                name_m = _TAG_NAME_RE.match(s, i + 2)
                name = name_m.group(0).lower() if name_m else ""
                # pop to matching open tag (tolerate misnesting)
                for k in range(len(stack) - 1, -1, -1):
                    if stack[k][0] == name:
                        while len(stack) > k:
                            popped, dneg, dpos, dlink = stack.pop()
                            neg_depth -= dneg
                            pos_depth -= dpos
                            link_depth -= dlink
                            if popped == "table" and table_stack:
                                table_stack.pop()
                            elif popped in ("td", "th") and cell_depth > 0:
                                cell_depth -= 1
                        break
                if name in BLOCK_TAGS:
                    block_iid += 1
                i = j + 1
                continue
            # opening tag
            j = s.find(">", i)
            if j == -1:
                break  # truncated mid-tag
            name_m = _TAG_NAME_RE.match(s, i + 1)
            if not name_m:
                i += 1
                continue
            name = name_m.group(0).lower()
            attrs = s[name_m.end():j]
            self_closing = attrs.rstrip().endswith("/") or name in VOID_TAGS
            if name in ("script", "style"):
                m2 = _RAW_CLOSE_RE[name].search(s, j + 1)
                i = n if m2 is None else m2.end()
                continue
            if name == "br":
                block_iid += 1
                i = j + 1
                continue
            if self_closing:
                i = j + 1
                continue
            aneg, apos = classify_attrs(attrs)
            dneg = 1 if (name in NEG_TAGS or aneg) else 0
            dpos = 1 if (name in POS_TAGS or apos) else 0
            dlink = 1 if name == "a" else 0
            stack.append((name, dneg, dpos, dlink))
            neg_depth += dneg
            pos_depth += dpos
            link_depth += dlink
            if name == "table":
                table_stack.append([table_count, -1, -1])
                table_count += 1
            elif name == "tr" and table_stack:
                table_stack[-1][1] += 1
                table_stack[-1][2] = -1
            elif name in ("td", "th") and table_stack:
                table_stack[-1][2] += 1
                cell_depth += 1
            if name in BLOCK_TAGS:
                block_iid += 1
            i = j + 1
            continue
        # text node
        j = s.find("<", i)
        if j == -1:
            j = n
        raw = s[i:j]
        stripped = raw.strip()
        if stripped:
            lead = len(raw) - len(raw.lstrip())
            trail = len(raw) - len(raw.rstrip())
            start = i + lead
            end = j - trail
            text = _WS_RE.sub(" ", _unescape(stripped))
            raw_len = end - start
            cell = None
            if (cell_depth > 0 and table_stack
                    and table_stack[-1][1] >= 0 and table_stack[-1][2] >= 0):
                cell = tuple(table_stack[-1])
            segs.append(_Seg(
                text, start, end, raw_len,
                raw_len if link_depth > 0 else 0,
                neg_depth > 0, pos_depth > 0, block_iid, cell))
        i = j
    return segs


# --- line grouping + boilerplate classification ----------------------------

def _score_line(words: int, link_density: float, neg: bool, pos: bool,
                has_digit: bool) -> float:
    """Boilerpipe-style density score + Arc90 hints. >= threshold =>
    main content (mirrors the intent of the reference's quality gate
    ordering + Textract LINE semantics; tuned on fixture corpus)."""
    score = 2.0 * min(words, 10) / 10.0
    score -= 3.0 * link_density
    if neg:
        score -= 2.5
    if pos:
        score += 1.5
    if has_digit:
        score += 0.5
    return score


CONTENT_THRESHOLD = 0.8

_KV_RE = re.compile(r"^([^:]{1,48}?)\s*:\s*(.+)$", re.S)
_SENTENCE_PUNCT_RE = re.compile(r"[.!?]")
# Checkbox-like markers -> SELECTION_ELEMENT blocks (the Textract
# selection-element analog; the reference review form's '-present'
# checkbox toggles, a2i-text-with-checkboxes.liquid.html:40-69)
_CHECKBOX_RE = re.compile(r"\[([ xX])\]")


def split_key_value(text: str) -> tuple[str, str] | None:
    """Same-line ``key: value`` detection (mirrors the trp FORMS
    consumption at fn-postprocess/main.py:64-99 — our KV analog)."""
    m = _KV_RE.match(text)
    if not m:
        return None
    key = m.group(1).strip()
    value = m.group(2).strip()
    if not key or not value:
        return None
    if len(key.split()) > 6 or _SENTENCE_PUNCT_RE.search(key):
        return None
    return key, value


def extract_html(payload: str) -> ExtractResult:
    """Extract main content + blocks from an HTML payload."""
    segs = _tokenize(payload)
    # PAGE block (Textract Block-model parity: one PAGE per document
    # page; HTML payloads are single-page) — block_id 0, spanning the
    # whole payload
    page_block = make_block(0, PAGE, "", 0, len(payload), 100.0,
                            is_content=False)
    # group consecutive segments sharing a block instance into lines
    lines: list[list[_Seg]] = []
    for seg in segs:
        if lines and lines[-1][0].block_iid == seg.block_iid:
            lines[-1].append(seg)
        else:
            lines.append([seg])

    blocks: list[dict] = [page_block]
    spans: list[tuple[int, int]] = []
    texts: list[str] = []
    bid = 1
    kv_gid = 0
    reading_order = 0
    for group in lines:
        text = " ".join(g.text for g in group)
        raw_chars = sum(g.raw_len for g in group) or 1
        link_chars = sum(g.link_chars for g in group)
        neg = any(g.neg for g in group)
        pos = any(g.pos for g in group)
        words = len(text.split())
        has_digit = _DIGIT_RE.search(text) is not None
        score = _score_line(words, link_chars / raw_chars, neg, pos, has_digit)
        is_content = score >= CONTENT_THRESHOLD
        start = group[0].start
        end = group[-1].end
        conf = line_confidence(text)
        blocks.append(make_block(
            bid, LINE, text, start, end, conf,
            reading_order=reading_order if is_content else -1,
            is_content=is_content))
        bid += 1
        # SELECTION_ELEMENT markers in the raw line region — emitted
        # regardless of the content classification (Textract reports
        # selection elements independently of text relevance)
        for m in _CHECKBOX_RE.finditer(payload, start, end):
            state = SELECTED if m.group(1).strip() else NOT_SELECTED
            blocks.append(make_block(
                bid, SELECTION_ELEMENT, m.group(0), m.start(), m.end(),
                line_confidence(m.group(0)), is_content=False,
                selection_status=state))
            bid += 1
        if is_content:
            reading_order += 1
            spans.append((start, end))
            texts.append(text)
            kv = split_key_value(text)
            if kv is not None:
                key, value = kv
                # sub-spans: locate the ':' in the raw source region
                cpos = payload.find(":", start, end)
                if cpos != -1 and payload[start:cpos].strip():
                    k_end = start + len(payload[start:cpos].rstrip())
                    v_raw = payload[cpos + 1:end]
                    v_start = cpos + 1 + (len(v_raw) - len(v_raw.lstrip()))
                    k_span = (start, k_end)
                    v_span = (v_start, end)
                else:
                    k_span = (start, end)
                    v_span = (start, end)
                kconf = line_confidence(key)
                vconf = line_confidence(value)
                blocks.append(make_block(
                    bid, KEY_VALUE, key, k_span[0], k_span[1], kconf,
                    kv_role=KEY, kv_group_id=kv_gid))
                bid += 1
                blocks.append(make_block(
                    bid, KEY_VALUE, value, v_span[0], v_span[1], vconf,
                    kv_role=VALUE, kv_group_id=kv_gid))
                bid += 1
                kv_gid += 1

    # TABLE/CELL structure blocks (FORMS+TABLES analog, SURVEY.md
    # §1.2): one TABLE block per <table> (row_idx/col_idx carry the
    # row/column COUNTS; conf = min over its cells) plus one CELL
    # block per td/th with its (row_idx, col_idx) grid position and
    # raw-source char span. Cell text also flows through the LINE
    # path above (td is a block boundary), so main_text/spans are
    # unchanged — these blocks add structure, not content.
    cells: dict[tuple[int, int, int], dict] = {}
    cell_order: list[tuple[int, int, int]] = []
    for seg in segs:
        if seg.cell is None:
            continue
        c = cells.get(seg.cell)
        if c is None:
            cells[seg.cell] = {"texts": [seg.text], "start": seg.start,
                               "end": seg.end}
            cell_order.append(seg.cell)
        else:
            c["texts"].append(seg.text)
            c["start"] = min(c["start"], seg.start)
            c["end"] = max(c["end"], seg.end)
    tables: dict[int, list[tuple[int, int, int]]] = {}
    for key in cell_order:
        tables.setdefault(key[0], []).append(key)
    for tid in sorted(tables):
        keys = tables[tid]
        confs = {k: line_confidence(" ".join(cells[k]["texts"]))
                 for k in keys}
        blocks.append(make_block(
            bid, TABLE, "",
            min(cells[k]["start"] for k in keys),
            max(cells[k]["end"] for k in keys),
            min(confs.values()), is_content=False,
            row_idx=max(k[1] for k in keys) + 1,
            col_idx=max(k[2] for k in keys) + 1))
        bid += 1
        for k in keys:
            c = cells[k]
            blocks.append(make_block(
                bid, CELL, " ".join(c["texts"]), c["start"], c["end"],
                confs[k], is_content=False, row_idx=k[1], col_idx=k[2]))
            bid += 1

    return ExtractResult(
        status="ok", kind="html",
        main_text="\n".join(texts), spans=spans, blocks=blocks,
        span_domain="payload")
