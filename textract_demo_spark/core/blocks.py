"""Block model — the engine's intermediate representation.

Regenerates the *shape* of the reference's Textract ``Blocks`` array
(consumed at ``source/ocr/postprocessing/fn-postprocess/main.py:49-60``
as LINE blocks with Text + Confidence, and via the trp form model as
KEY/VALUE pairs, ``main.py:64-99``) as a flat columnar record:

    (block_id, page, block_type, text, char_start, char_end, conf,
     x0, y0, x1, y1, reading_order, kv_role, kv_group_id, is_content)

``char_start``/``char_end`` are Python-str indices into the span
domain of the payload kind (see ``ExtractResult.span_domain``):
HTML / plain payloads index into the original ``text`` column value;
PDF payloads index into the extracted ``main_text`` (the original
value is base64 — raw offsets are meaningless there).
"""

from __future__ import annotations

from dataclasses import dataclass, field

PAGE = "PAGE"
LINE = "LINE"
KEY_VALUE = "KEY_VALUE"
# WORD blocks are not materialized by the extractors (they would
# multiply the block count ~8x for data nobody stores); they are a
# DERIVED operator — engine.udfs.words_table splits LINE blocks into
# WORD rows JVM-side (split + posexplode + cumulative offsets), the
# Spark-first shape of the same information.
WORD = "WORD"
# Table structure blocks — the FORMS+TABLES analog: the reference
# requests FeatureTypes=["FORMS","TABLES"]
# (source/ocr/textract-integration/fn-call-textract/main.py:53-61) and
# the public Textract Block model carries TABLE/CELL with row/column
# indices (SURVEY.md §1.2).
TABLE = "TABLE"
CELL = "CELL"
# Checkbox analog — Textract SELECTION_ELEMENT; the reference's review
# template exposes checkbox '-present' toggles
# (source/ocr/human-review/a2i-text-with-checkboxes.liquid.html:40-69).
SELECTION_ELEMENT = "SELECTION_ELEMENT"
SELECTED = "SELECTED"
NOT_SELECTED = "NOT_SELECTED"

KEY = "KEY"
VALUE = "VALUE"

# status enum (SURVEY.md §1.4) — the reference's typed error taxonomy
# becomes a status column:
#   rejected      <- PoorQualityImage (fn-preprocess/main.py:22-25):
#                    the quality gate refused the payload (empty,
#                    truncated, binary noise, non-PDF bytes)
#   malformed     <- MalformedRequest (fn-preprocess/main.py:26-29):
#                    the request envelope itself is broken (a PDF
#                    data-URI whose base64 does not decode)
#   model_error   <- ModelError: the extractor failed AFTER the gate
#                    accepted the payload (e.g. a PDF that decodes and
#                    sniffs fine but dies mid-parse)
#   review_failed <- ReviewFailed/MalformedReviewResponse
#                    (fn-human-review-callback/main.py:24-30): the
#                    human-review row for this turn was unusable
STATUS_OK = "ok"
STATUS_REJECTED = "rejected"
STATUS_MALFORMED = "malformed"
STATUS_MODEL_ERROR = "model_error"
STATUS_REVIEW_FAILED = "review_failed"


def make_block(
    block_id: int,
    block_type: str,
    text: str,
    char_start: int,
    char_end: int,
    conf: float,
    page: int = 1,
    x0: float | None = None,
    y0: float | None = None,
    x1: float | None = None,
    y1: float | None = None,
    reading_order: int = -1,
    kv_role: str | None = None,
    kv_group_id: int | None = None,
    is_content: bool = True,
    row_idx: int | None = None,
    col_idx: int | None = None,
    selection_status: str | None = None,
) -> dict:
    return {
        "block_id": block_id,
        "page": page,
        "block_type": block_type,
        "text": text,
        "char_start": char_start,
        "char_end": char_end,
        "conf": conf,
        "x0": x0,
        "y0": y0,
        "x1": x1,
        "y1": y1,
        "reading_order": reading_order,
        "kv_role": kv_role,
        "kv_group_id": kv_group_id,
        "is_content": is_content,
        "row_idx": row_idx,
        "col_idx": col_idx,
        "selection_status": selection_status,
    }


@dataclass
class ExtractResult:
    """Output of the per-payload extraction core."""

    status: str = STATUS_OK
    kind: str = "plain"  # html | pdf | plain | bad
    main_text: str = ""
    spans: list[tuple[int, int]] = field(default_factory=list)
    blocks: list[dict] = field(default_factory=list)
    span_domain: str = "payload"  # payload | main_text
