"""Date entity detection — the Comprehend-fallback analog.

The reference calls ``comprehend.detect_entities`` and keeps entities
with ``Type == "DATE"`` only when the key-value search found no date
(``source/ocr/postprocessing/fn-postprocess/main.py:102-117``),
validating entity shape (must contain '/', ':' or '-',
``main.py:108-110``) and rescaling the 0-1 score x100
(``main.py:112-115``). This module is the from-scratch detector: a
regex grammar over numeric and month-name date forms, scored by
pattern specificity. Entities are returned in text order (the
reference iterates entities in response order => candidate_seq is
appearance order; SURVEY.md §2 W2 tie semantics).

Pure Python. No Spark imports.
"""

from __future__ import annotations

import re

from .confidence import entity_score

_MONTHS = (r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
           r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
           r"Nov(?:ember)?|Dec(?:ember)?)")

# (pattern, specificity) — higher specificity = more informative shape.
PATTERNS: list[tuple[re.Pattern, float]] = [
    # ISO datetime / date: 2020-07-07 18:54:22
    (re.compile(r"\b\d{4}-\d{2}-\d{2}(?: \d{2}:\d{2}:\d{2})?\b"), 0.93),
    # dd-mm-yyyy [hh:mm:ss] (the golden payload form "21-06-2018 18:54:22",
    # source/ocr/README.md:68)
    (re.compile(r"\b\d{2}-\d{2}-\d{4}(?: \d{2}:\d{2}:\d{2})?\b"), 0.88),
    # dd/mm/yyyy or d/m/yy
    (re.compile(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b"), 0.82),
    # Month-name forms: July 7, 2020 / 7 July 2020
    (re.compile(r"\b" + _MONTHS + r"\.? \d{1,2},? \d{4}\b", re.I), 0.78),
    (re.compile(r"\b\d{1,2} " + _MONTHS + r"\.?,? \d{4}\b", re.I), 0.78),
    # bare time-of-day
    (re.compile(r"\b\d{2}:\d{2}:\d{2}\b"), 0.55),
]


def detect_date_entities(text: str) -> list[dict]:
    """All date-like entities in ``text``, in order of appearance.

    Returns ``[{"text": str, "score": float (0-1), "start": int}]``.
    Overlapping matches keep the earliest-starting, then most-specific
    pattern (a time inside an already-matched datetime is not
    re-emitted).
    """
    raw: list[tuple[int, int, float, str]] = []
    for pat, spec in PATTERNS:
        for m in pat.finditer(text):
            raw.append((m.start(), m.end(), spec, m.group(0)))
    raw.sort(key=lambda t: (t[0], -t[2], -(t[1] - t[0])))
    out: list[dict] = []
    covered_end = -1
    for start, end, spec, mtext in raw:
        if start < covered_end:
            continue  # overlaps a previously accepted entity
        out.append({
            "text": mtext.strip("\t\n\r "),
            "score": entity_score(spec, mtext),
            "start": start,
        })
        covered_end = end
    return out
