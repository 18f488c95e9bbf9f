"""Deterministic synthetic transcript fixtures + golden expected
outputs (FIXTURES.md).

Plays the role of the reference's fixture corpus: the labelled
``receipts.zip`` sample set (``source/ocr/preprocessing/README.md:46-57``),
the canned review-task input (``source/ocr/human-review/
a2i_humanloop.ipynb`` cell 12: vendor "Amazon Web Services" conf 40,
date "2020-07-07" conf 90, total "64.30" conf 65), and the golden
end-to-end payload (``source/ocr/README.md:49-87``: vendor "My Cool
Restaura" 99.73, date "21-06-2018 18:54:22" 91.30, total "4.60" 34.79).

Every value derives from ``(seed, conv_id, turn_idx)`` via md5 — no
RNG state, so any row is reproducible in isolation at any scale (the
property that lets executors generate partitions independently).

``main_text`` and ``spans`` goldens are BY CONSTRUCTION (the builder
records offsets as it assembles the payload — it does not run the
extractor). Field-level goldens (model_result) use the shared
pure-Python rule module ``core.fields`` over the constructed blocks,
exactly as the reference's goldens embed known Textract confidences.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from ..core.blocks import KEY, KEY_VALUE, LINE, VALUE, make_block
from ..core.confidence import line_confidence, stable_hash
from ..core.fields import REVIEW_THRESHOLD, needs_review, postprocess_blocks
from ..core.html_extract import split_key_value

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

VENDORS = [
    "My Cool Restaurant", "Blue Bottle Cafe", "Acme Hardware Supply",
    "Golden Wok Kitchen", "Corner Bakery Co", "Sunrise Grocers",
    "Pacific Fuel Stop", "Northside Pharmacy", "Cedar Street Books",
    "Lakeview Diner", "Metro Office Depot", "Harbor Fish Market",
    "Pine Valley Motel", "City Bike Works", "Maple Leaf Florist",
    "Red Door Tavern", "Summit Sports Gear", "Willow Tea House",
    "Iron Hill Brewery", "Star Dry Cleaning", "Green Field Organics",
    "Old Town Barbers", "Riverside Parking", "Copper Pot Catering",
]
ITEMS = [
    "Flat White", "House Blend", "Screwdriver Set", "Fried Rice",
    "Sourdough Loaf", "Orange Juice", "Unleaded Fuel", "Vitamin C",
    "Paperback Novel", "Club Sandwich", "Printer Paper", "Salmon Fillet",
    "Room Night", "Tire Tube", "Rose Bouquet", "Pale Ale",
    "Tennis Balls", "Green Tea", "Pint Glass", "Shirt Press",
]
TOTAL_KEYS = ["TOTAL", "Total", "Amount Due", "Total Amount", "Grand Total"]
THANKS = ["Thank you for visiting", "Please come again soon",
          "We appreciate your business"]
NAV_WORDS = ["Home", "Archive", "Pricing", "Support", "Login", "About",
             "Careers", "Blog", "Contact", "Terms"]
CHAT = ["could you pull up the latest receipt for me",
        "sure thing, fetching the document now",
        "the totals look consistent with last month",
        "let me know if the vendor name needs fixing",
        "uploading the scanned copy in a moment",
        "the reconciliation job finished without errors"]


def _h(seed: int, conv_id: str, turn_idx: int, salt: str) -> int:
    return stable_hash(f"{seed}:{conv_id}:{turn_idx}:{salt}")


# --------------------------------------------------------------------------
# receipt content construction (shared by the HTML and PDF builders)

def _receipt_lines(seed: int, conv_id: str, turn_idx: int,
                   date_fallback: bool, as_table: bool = False):
    """Content lines of one receipt. Index 0 is always the vendor.

    With ``as_table`` the item lines are (description, price) cell
    pairs for a 2-column itemized table — the extractor renders each
    cell as its own visual line, so the flat ``lines`` list carries
    both cells in order; returns (lines, table_items)."""
    h = lambda s: _h(seed, conv_id, turn_idx, s)  # noqa: E731
    vendor = VENDORS[h("vendor") % len(VENDORS)]
    lines = [vendor]
    table_items: list[tuple[str, str]] = []
    n_items = 1 + h("nitems") % 3
    subtotal = 0.0
    for i in range(n_items):
        qty = 1 + h(f"qty{i}") % 3
        item = ITEMS[h(f"item{i}") % len(ITEMS)]
        price = (100 + h(f"price{i}") % 9000) / 100.0
        subtotal += qty * price
        if as_table:
            table_items.append((f"{qty} x {item}", f"${price:.2f}"))
            lines.append(f"{qty} x {item}")
            lines.append(f"${price:.2f}")
        else:
            lines.append(f"{qty} x {item} ${price:.2f}")
    total = round(subtotal * 1.1, 2)

    dsel = h("datefmt") % 4
    if dsel == 0:
        date_str = f"{1 + h('dd') % 28:02d}-{1 + h('dm') % 12:02d}-201{8 + h('dy') % 2} " \
                   f"{h('dh') % 24:02d}:{h('dmin') % 60:02d}:{h('ds') % 60:02d}"
    elif dsel == 1:
        date_str = f"20{18 + h('dy') % 9}-{1 + h('dm') % 12:02d}-{1 + h('dd') % 28:02d}"
    elif dsel == 2:
        date_str = f"{1 + h('dd') % 28}/{1 + h('dm') % 12}/20{18 + h('dy') % 9}"
    else:
        date_str = f"{1 + h('dd') % 28:02d}-{1 + h('dm') % 12:02d}-20{18 + h('dy') % 9}"

    if date_fallback:
        # inline date in a body line; no "Date:" key-value pair
        lines.append(f"Visited on {date_str}")
    else:
        lines.append(f"Date: {date_str}")
    if h("sub") % 2 == 0:
        lines.append(f"Subtotal: ${subtotal:.2f}")
    if h("hastotal") % 100 < 90:
        tkey = TOTAL_KEYS[h("tkey") % len(TOTAL_KEYS)]
        lines.append(f"{tkey}: ${total:.2f}")
    lines.append(THANKS[h("thanks") % len(THANKS)])
    if as_table:
        return lines, table_items
    return lines


def _blocks_from_lines(lines: list[str], spans: list[tuple[int, int]],
                       kv_overrides: list[tuple[str, str] | None] | None = None,
                       ) -> list[dict]:
    """Construct the expected blocks for content lines, mirroring the
    extractor's block emission (LINE per line + KEY_VALUE pairs via
    the shared split_key_value helper, or an explicit per-line KV when
    the builder laid the line out as two geometry columns). Used only
    for golden field labelling — boilerplate LINE blocks are
    irrelevant to the rules."""
    blocks: list[dict] = []
    bid = 0
    gid = 0
    for order, (text, (start, end)) in enumerate(zip(lines, spans)):
        blocks.append(make_block(bid, LINE, text, start, end,
                                 line_confidence(text),
                                 reading_order=order, is_content=True))
        bid += 1
        if kv_overrides is not None:
            kv = kv_overrides[order]
        else:
            kv = split_key_value(text)
        if kv is not None:
            key, value = kv
            blocks.append(make_block(bid, KEY_VALUE, key, start, end,
                                     line_confidence(key),
                                     kv_role=KEY, kv_group_id=gid))
            bid += 1
            blocks.append(make_block(bid, KEY_VALUE, value, start, end,
                                     line_confidence(value),
                                     kv_role=VALUE, kv_group_id=gid))
            bid += 1
            gid += 1
    return blocks


def _build_html(seed: int, conv_id: str, turn_idx: int,
                lines: list[str],
                table_items: list[tuple[str, str]] | None = None,
                ) -> tuple[str, list[tuple[int, int]]]:
    """Assemble the HTML payload, recording content-line spans
    (offsets into the payload) by construction. With ``table_items``,
    the item lines are laid out as a 2-column ``<table>`` (one row per
    item: description, price) instead of ``<p>`` lines — each cell is
    its own visual line for the extractor, and the builder records the
    corresponding per-cell spans in ``lines`` order (the caller
    pre-flattens cells into ``lines``)."""
    h = lambda s: _h(seed, conv_id, turn_idx, s)  # noqa: E731
    parts: list[str] = []
    off = 0
    spans: list[tuple[int, int]] = []

    def add(s: str) -> None:
        nonlocal off
        parts.append(s)
        off += len(s)

    def add_span(line: str) -> None:
        nonlocal off
        start = off
        add(line)
        spans.append((start, off))

    add("<!DOCTYPE html>\n<html><head><title>Receipts Portal</title></head>\n<body>\n")
    add('<nav class="topnav">')
    for i in range(4 + h("nnav") % 4):
        w = NAV_WORDS[(h("nav") + i) % len(NAV_WORDS)]
        add(f'<a href="/{w.lower()}">{w}</a> ')
    add("</nav>\n")
    add('<div class="sidebar widget">\n<ul>\n')
    for i in range(3 + h("nside") % 3):
        w = NAV_WORDS[(h("side") + i) % len(NAV_WORDS)]
        add(f'<li><a href="/s/{i}">{w} Archive</a></li>\n')
    add("</ul>\n</div>\n")
    add('<div class="content">\n')
    n_table_lines = 2 * len(table_items) if table_items else 0
    head = lines[:1]
    tail = lines[1 + n_table_lines:]
    for line in head:
        add("<p>")
        add_span(line)
        add("</p>\n")
    if table_items:
        add("<table>\n")
        for desc, price in table_items:
            add("<tr><td>")
            add_span(desc)
            add("</td><td>")
            add_span(price)
            add("</td></tr>\n")
        add("</table>\n")
    for line in tail:
        add("<p>")
        add_span(line)
        add("</p>\n")
    add("</div>\n")
    add('<footer class="footer"><a href="/privacy">Privacy</a> '
        '<a href="/terms">Terms</a> <span>Portal Inc</span></footer>\n'
        "</body></html>\n")
    return "".join(parts), spans


def _build_pdf(seed: int, conv_id: str, turn_idx: int,
               lines: list[str]):
    """Assemble a minimal single-page PDF payload (base64 data URI).

    Key-value lines are laid out either as two-column rows (key at
    x=72, value at x=400 — exercises the geometry pairing) or as a
    single colon run, per-line deterministic. Returns (payload,
    expected content lines as the extractor renders them, spans into
    main_text, per-line kv tuples)."""
    import base64
    import zlib

    h = lambda s: _h(seed, conv_id, turn_idx, s)  # noqa: E731

    def show(s: str, hexed: bool) -> str:
        # every third line (deterministic) uses a hex string literal —
        # many real PDF producers emit hex exclusively (spec 7.3.4.3)
        if hexed:
            return "<" + "".join(f"{ord(c):02X}" for c in s) + "> Tj"
        return f"({s}) Tj"

    ops: list[str] = []
    rendered: list[str] = []
    kvs: list[tuple[str, str] | None] = []
    y = 740
    for i, line in enumerate(lines):
        kv = split_key_value(line)
        two_col = kv is not None and h(f"twocol{i}") % 2 == 0 \
            and len(kv[0]) <= 30
        hexed = h(f"hex{i}") % 3 == 0
        if two_col:
            key, value = kv
            ops.append(f"BT /F1 12 Tf 72 {y} Td {show(key, hexed)} ET")
            ops.append(f"BT /F1 12 Tf 400 {y} Td {show(value, hexed)} ET")
            rendered.append(f"{key} {value}")
            kvs.append((key, value))
        else:
            ops.append(f"BT /F1 12 Tf 72 {y} Td {show(line, hexed)} ET")
            rendered.append(line)
            kvs.append(split_key_value(line))
        y -= 20
    content = ("\n".join(ops)).encode("latin-1")
    use_flate = h("flate") % 2 == 0
    if use_flate:
        body = zlib.compress(content)
        filt = "/Filter /FlateDecode "
    else:
        body = content
        filt = ""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n",
        (f"4 0 obj << {filt}/Length {len(body)} >> stream\n").encode("latin-1")
        + body + b"\nendstream endobj\n",
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(out))
        out.extend(o)
    xref_at = len(out)
    out.extend(f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode())
    for o in offsets:
        out.extend(f"{o:010d} 00000 n \n".encode())
    out.extend(
        f"trailer << /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode())
    payload = "data:application/pdf;base64," + base64.b64encode(bytes(out)).decode()
    spans: list[tuple[int, int]] = []
    off = 0
    for r in rendered:
        spans.append((off, off + len(r)))
        off += len(r) + 1
    return payload, rendered, spans, kvs


def _build_bad(seed: int, conv_id: str, turn_idx: int) -> tuple[str, str]:
    """Failing payload + its expected typed status (SURVEY.md §1.4):
    quality-gate refusals are 'rejected'; a broken base64 envelope is
    'malformed' (MalformedRequest analog)."""
    h = _h(seed, conv_id, turn_idx, "bad")
    variant = h % 5
    if variant == 0:
        return "", "rejected"
    if variant == 1:
        return "   \n\t  ", "rejected"
    if variant == 2:
        vendor = VENDORS[h % len(VENDORS)]
        return (f'<html><body><div class="content"><p>Receipt from {vendor}',
                "rejected")
    if variant == 3:
        return "data:application/pdf;base64,%%%not//base64@@@", "malformed"
    noise = "".join(chr((h >> (i % 48)) % 32) for i in range(64))
    return "BIN" + noise, "rejected"


# --------------------------------------------------------------------------

def make_turn(seed: int, conv_id: str, turn_idx: int) -> tuple[dict, dict]:
    """Build one (transcript_row, expected_row) pair."""
    h = lambda s: _h(seed, conv_id, turn_idx, s)  # noqa: E731
    u = h("kind") % 100
    role = ("user", "assistant", "tool")[turn_idx % 3]
    ts = EPOCH + timedelta(seconds=int(stable_hash(conv_id) % 86400)
                           + turn_idx * 7)

    if u < 42:
        kind = "html"
    elif u < 55:
        kind = "table"  # itemized 2-column <table> receipt
    elif u < 75:
        kind = "pdf"
    elif u < 90:
        kind = "plain"
    elif u < 95:
        kind = "fallback"
    else:
        kind = "bad"

    tool = {"html": "browser", "fallback": "browser", "table": "browser",
            "pdf": "pdf_reader"}.get(kind, "")

    if kind in ("html", "fallback", "table"):
        table_items = None
        if kind == "table":
            lines, table_items = _receipt_lines(
                seed, conv_id, turn_idx, False, as_table=True)
        else:
            lines = _receipt_lines(seed, conv_id, turn_idx,
                                   kind == "fallback")
        payload, spans = _build_html(seed, conv_id, turn_idx, lines,
                                     table_items=table_items)
        blocks = _blocks_from_lines(lines, spans)
        model = postprocess_blocks(blocks)
        expected = {
            "status": "ok", "main_text": "\n".join(lines), "spans": spans,
            "model_result": model, "needs_review": needs_review(model),
        }
    elif kind == "pdf":
        lines = _receipt_lines(seed, conv_id, turn_idx, False)
        payload, rendered, spans, kvs = _build_pdf(seed, conv_id, turn_idx, lines)
        blocks = _blocks_from_lines(rendered, spans, kv_overrides=kvs)
        model = postprocess_blocks(blocks)
        expected = {
            "status": "ok", "main_text": "\n".join(rendered), "spans": spans,
            "model_result": model, "needs_review": needs_review(model),
        }
    elif kind == "plain":
        payload = CHAT[h("chat") % len(CHAT)]
        # plain extraction emits a single LINE block, never KV pairs
        blocks = _blocks_from_lines([payload], [(0, len(payload))],
                                    kv_overrides=[None])
        model = postprocess_blocks(blocks)
        expected = {
            "status": "ok", "main_text": payload,
            "spans": [(0, len(payload))],
            "model_result": model, "needs_review": needs_review(model),
        }
    else:
        payload, bad_status = _build_bad(seed, conv_id, turn_idx)
        expected = {
            "status": bad_status, "main_text": "", "spans": [],
            "model_result": None, "needs_review": None,
        }

    row = {"conv_id": conv_id, "turn_idx": turn_idx, "role": role,
           "text": payload, "tool": tool, "ts": ts}
    exp = {"conv_id": conv_id, "turn_idx": turn_idx, **expected}
    return row, exp


def conv_turn_counts(n_convs: int, mean_turns: int = 4,
                     hot_conv_fraction: float = 0.04,
                     hot_turns: int = 96, seed: int = 42) -> list[tuple[str, int]]:
    """Per-conversation turn counts. The first ``hot_conv_fraction``
    of conversations are 'hot' (many turns) to exercise skew salting
    (SURVEY.md §4.3)."""
    out = []
    n_hot = max(1, int(n_convs * hot_conv_fraction)) if n_convs else 0
    for c in range(n_convs):
        conv_id = f"conv-{c:06d}"
        if c < n_hot:
            n = hot_turns + stable_hash(conv_id, "hot") % hot_turns
        else:
            n = 2 + stable_hash(conv_id, "nt") % (2 * mean_turns - 3)
        out.append((conv_id, n))
    return out


def make_fixtures(n_convs: int = 50, mean_turns: int = 4,
                  hot_conv_fraction: float = 0.04, hot_turns: int = 96,
                  seed: int = 42) -> dict:
    """Generate fixture tables as lists of dicts:
    ``{"transcripts": [...], "expected_turns": [...], "reviews": [...]}``.
    """
    transcripts: list[dict] = []
    expected: list[dict] = []
    reviews: list[dict] = []
    for conv_id, n_turns in conv_turn_counts(
            n_convs, mean_turns, hot_conv_fraction, hot_turns, seed):
        for t in range(n_turns):
            row, exp = make_turn(seed, conv_id, t)
            transcripts.append(row)
            expected.append(exp)
            if (exp["status"] == "ok" and exp["needs_review"]
                    and _h(seed, conv_id, t, "dorev") % 2 == 0):
                hh = lambda s: _h(seed, conv_id, t, s)  # noqa: E731
                mr = exp["model_result"]
                date_empty = hh("revdate") % 5 == 0
                reviews.append({
                    "conv_id": conv_id, "turn_idx": t,
                    "vendor": (mr["Vendor"]["Value"] or "Unknown Vendor").title(),
                    "date": "" if date_empty else (
                        mr["Date"]["Value"] or "2020-07-07"),
                    "total": mr["Total"]["Value"] or f"{(hh('revtot') % 9000 + 100) / 100.0:.2f}",
                    # optional tax answer (the form's tax row +
                    # '-present' checkbox): absent for ~half the
                    # reviews, mirrored as None
                    "tax": (f"{(hh('revtax') % 900 + 10) / 100.0:.2f}"
                            if hh("taxpresent") % 2 == 0 else None),
                    "worker_id": f"worker-{hh('wid') % 1000:04d}",
                    "review_ts": row["ts"] + timedelta(seconds=3600),
                })
    return {"transcripts": transcripts, "expected_turns": expected,
            "reviews": reviews}
