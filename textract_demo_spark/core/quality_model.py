"""Trainable quality-gate scorer — the Rekognition custom-labels
TRAINING analog.

The reference does not ship a fixed heuristic: it *trains* a
Rekognition custom-labels model on a labelled corpus and the gate is
that model's top label (``source/ocr/preprocessing/README.md:46-57``,
the ``groundtruth-labelling/`` notebooks, and ``Automated Setup.ipynb``
cell 4 build the labelled dataset and kick off training;
``fn-preprocess/main.py:117-146`` then routes on the trained model's
output). ``core/quality.py`` is our fixed-heuristic stand-in for the
*inference* side; this module closes the *training* side: a logistic
scorer over payload-shape features, fit offline on a labelled corpus,
whose frozen coefficients drive a fully vectorized Spark gate.

Design constraints, in order:

1. **The applied gate must be native Spark SQL** (no Python in the hot
   path at 100 TB), so every feature is defined as an integer
   expression computable identically in Spark SQL and DuckDB (the
   driver oracle replays the score). Floats never cross an engine
   boundary: training happens in float, the shipped model is the
   INTEGER-quantized score ``score_micro = b + sum(w_i * f_i)`` with
   micro-unit weights, and the routing decision is ``score_micro >= 0``.
2. **Coefficients are plan-time literals** when applied (the broadcast-
   dim alternative costs a join; a 10-term literal sum costs nothing —
   same lesson as the sign-LSH hyperplanes, see
   datapipe/similarity.py).
3. **Training is deterministic**: fixed corpus order, zero init, fixed
   learning rate and epoch count, pure numpy — same weights on every
   machine, so the frozen constants below are reproducible by running
   ``train_quality_scorer(labelled_corpus())``.

Features (all integers; scales folded into the quantized weights):

========  =====================================================
f_empty        1 if trim(text) == ''
f_pdf_prefix   1 if text starts with the PDF data-URI envelope
f_pdf_magic    1 if the base64 body starts with 'JVBE' (= b"%PD" +
               high bits of 'F': a decodable %PDF magic)
f_b64_clean    1 if the base64 body is alphabet-clean with valid
               padding (length % 4 == 0)
f_html_doc     1 if lower(trim) starts with <!doctype or <html
f_angle_pair   1 if text contains '<' and '>' and '</'
f_unterm       1 if text has '<' and the LAST '<' is after the
               last '>' (unterminated final tag)
f_no_close     1 if text has '<' and '>' but no '</'
f_nonprint_bp  floor(10000 * non-ASCII-printable chars / chars)
               over trim(text) ('ASCII-printable' = [\\x20-\\x7E\\t\\n\\r];
               deliberately ASCII-conservative so the SQL and Python
               featurizers agree byte-for-byte)
f_len_log2     floor(log2(length(trim) + 1)) via length(bin(n)) - 1
========  =====================================================
"""

from __future__ import annotations

import re

PDF_PREFIX = "data:application/pdf;base64,"
FEATURES = (
    "f_empty", "f_pdf_prefix", "f_pdf_magic", "f_b64_clean",
    "f_html_doc", "f_angle_pair", "f_unterm", "f_no_close",
    "f_nonprint_bp", "f_len_log2",
)
# float-model per-feature scales (training only; folded into the
# integer weights at quantization time)
_SCALES = (1, 1, 1, 1, 1, 1, 1, 1, 10000, 32)

_PRINTABLE_RE = re.compile(r"[\x20-\x7E\t\n\r]")
_B64_CLEAN_RE = re.compile(r"^[A-Za-z0-9+/]*={0,2}$")


def featurize(text: str | None) -> list[int]:
    """Integer feature vector — the exact Python mirror of the SQL
    expressions emitted by :func:`feature_sql` (property-tested
    equivalent in tests)."""
    t = text or ""
    # ASCII-\s strip set (Java/RE2 \s = [ \t\n\x0B\f\r]) — SQL trim()
    # strips only spaces, so the SQL featurizer trims via regexp and
    # this must match it exactly (not Python's unicode-aware strip())
    s = t.strip(" \t\n\x0b\f\r")
    f_empty = 1 if not s else 0
    f_pdf_prefix = 1 if t.startswith(PDF_PREFIX) else 0
    body = t[len(PDF_PREFIX):] if f_pdf_prefix else ""
    f_pdf_magic = 1 if f_pdf_prefix and body.startswith("JVBE") else 0
    f_b64_clean = (1 if f_pdf_prefix and len(body) % 4 == 0
                   and _B64_CLEAN_RE.match(body) else 0)
    low = s.lower()
    f_html_doc = 1 if low.startswith(("<!doctype", "<html")) else 0
    f_angle_pair = 1 if ("<" in t and ">" in t and "</" in t) else 0
    last_lt, last_gt = s.rfind("<"), s.rfind(">")
    f_unterm = 1 if (last_lt >= 0 and last_lt > last_gt) else 0
    f_no_close = 1 if (last_lt >= 0 and last_gt >= 0
                       and "</" not in s) else 0
    n = len(s)
    nonprint = n - len(_PRINTABLE_RE.findall(s))
    f_nonprint_bp = (10000 * nonprint) // n if n else 0
    f_len_log2 = (n + 1).bit_length() - 1
    return [f_empty, f_pdf_prefix, f_pdf_magic, f_b64_clean,
            f_html_doc, f_angle_pair, f_unterm, f_no_close,
            f_nonprint_bp, f_len_log2]


def labelled_corpus() -> list[tuple[str, int]]:
    """Deterministic labelled training corpus (the
    ``groundtruth-labelling/`` analog): synthetic payloads across every
    routing class the heuristic gate knows, labelled by
    ``classify_quality`` itself — training distills the gate the
    operators already trust, exactly as the reference's labelled
    dataset encodes its operators' quality judgments. ~700 samples,
    fixed seed, fixed order."""
    import base64
    import random

    from .quality import classify_quality

    rng = random.Random(20260818)
    words = ("invoice total vendor amount shipping tax date item qty "
             "unit price subtotal balance due net terms po ref").split()

    def sentence(k: int) -> str:
        return " ".join(rng.choice(words) for _ in range(k))

    samples: list[str] = []
    for i in range(80):  # good plain
        samples.append(sentence(5 + i % 40))
    for i in range(80):  # good html
        body = "".join(f"<p>{sentence(4 + j % 9)}</p>"
                       for j in range(1 + i % 4))
        samples.append("<html><body><div>" + body + "</div></body></html>")
    for i in range(40):  # good html with doctype
        samples.append("<!DOCTYPE html>\n<html><body><p>"
                       + sentence(6 + i % 20) + "</p></body></html>")
    for i in range(80):  # good pdf (tiny but decodable %PDF..endobj)
        pdf = (f"%PDF-1.4\n1 0 obj\n<< /T {i} >>\nendobj\n"
               f"%{sentence(2 + i % 6)}\n%%EOF").encode()
        samples.append(PDF_PREFIX + base64.b64encode(pdf).decode())
    for _ in range(40):  # bad: empty / whitespace
        samples.append(rng.choice(["", " ", "\n", "\t \n", "   "]))
    for i in range(60):  # bad: truncated html (unterminated final tag)
        samples.append("<html><body><p>" + sentence(3 + i % 8) + "<di")
    for i in range(60):  # bad: html that never closes anything
        samples.append("<html><body><p>" + sentence(3 + i % 8))
    for i in range(60):  # bad: binary noise
        junk = "".join(chr(rng.randrange(1, 32)) for _ in range(20 + i))
        samples.append(junk + sentence(2))
    for i in range(60):  # bad: pdf envelope, not a pdf inside
        samples.append(PDF_PREFIX
                       + base64.b64encode(sentence(4 + i % 7).encode())
                       .decode())
    for i in range(60):  # bad: malformed base64 in the envelope
        samples.append(PDF_PREFIX + "!!notb64!!" + sentence(2 + i % 5))
    for i in range(40):  # plain text that merely mentions tags: good
        samples.append(sentence(4) + " use <b> and </b> " + sentence(3 + i % 6))
    return [(s, 1 if classify_quality(s)["label"] == "good" else 0)
            for s in samples]


def train_quality_scorer(corpus: list[tuple[str, int]] | None = None,
                         lr: float = 0.5, epochs: int = 400,
                         scale: int = 1_000_000
                         ) -> tuple[int, list[int]]:
    """Fit logistic weights by full-batch gradient descent and return
    the integer-quantized model ``(bias_micro, weights_micro)`` with
    the decision rule ``bias + dot(weights, featurize(text)) >= 0``.

    Deterministic: zero init, fixed corpus order, fixed lr/epochs.
    Raises if quantization flips any training decision (the integer
    model must reproduce the float model's routing exactly)."""
    import numpy as np

    corpus = labelled_corpus() if corpus is None else corpus
    x = np.array([featurize(t) for t, _ in corpus], dtype=np.float64)
    x /= np.array(_SCALES, dtype=np.float64)
    y = np.array([lab for _, lab in corpus], dtype=np.float64)
    n, d = x.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(epochs):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (x.T @ g) / n
        b -= lr * g.mean()
    b_q = round(b * scale)
    w_q = [round(wi / si * scale) for wi, si in zip(w, _SCALES)]
    zi = x @ w + b
    zq = np.array([b_q + int(np.dot(w_q, fv))
                   for fv in (featurize(t) for t, _ in corpus)])
    if ((zi >= 0) != (zq >= 0)).any():
        raise RuntimeError("quantization flipped a training decision")
    return b_q, w_q


# frozen model (reproduce with train_quality_scorer()); asserted
# fresh-trainable and fixture-faithful in tests/test_quality_model.py
TRAINED_BIAS_MICRO = 607112
TRAINED_WEIGHTS_MICRO = [
    -2561638, -3113237, 4460272, 266520, -478794,
    3687924, -1178157, -3275478, -331, 33629,
]


def score_micro(text: str | None,
                bias: int | None = None,
                weights: list[int] | None = None) -> int:
    """Integer score of one payload under the (default: frozen) model."""
    b = TRAINED_BIAS_MICRO if bias is None else bias
    w = TRAINED_WEIGHTS_MICRO if weights is None else weights
    return b + sum(wi * fi for wi, fi in zip(w, featurize(text)))


def feature_sql(col: str, dialect: str) -> dict[str, str]:
    """The feature expressions as SQL strings over column ``col``,
    identical in value for ``dialect`` in {'spark', 'duckdb'} (only
    function-name spelling differs). Shared by the Spark gate and the
    driver oracle so there is ONE definition of each feature."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(dialect)
    # whitespace trim via an EXPLICIT class (plain trim() strips only
    # spaces; \s diverges across engines — Java \s includes \x0B, RE2
    # \s does not); Python mirror strips the same ASCII set
    ws = r"[ \t\n\x0B\f\r]"
    s = (f"regexp_replace({col}, "
         f"'^{ws}+|{ws}+$', '')".replace("\\", "\\\\")
         if dialect == "spark" else
         f"regexp_replace({col}, '^{ws}+|{ws}+$', '', 'g')")
    prefix_len = len(PDF_PREFIX)
    body = f"substr({col}, {prefix_len + 1})"
    if dialect == "spark":
        pdf_prefix = f"CASE WHEN {col} LIKE '{PDF_PREFIX}%' THEN 1 ELSE 0 END"
        b64_ok = f"{body} RLIKE '^[A-Za-z0-9+/]*={{0,2}}$'"
        # Spark instr(str, substr); no strrpos — use reverse()
        last_lt = f"(length({s}) - instr(reverse({s}), '<') + 1)"
        last_gt = f"(length({s}) - instr(reverse({s}), '>') + 1)"
        has_lt = f"instr({s}, '<') > 0"
        has_gt = f"instr({s}, '>') > 0"
        has_close = f"instr({s}, '</') > 0"
        contains = (f"instr({col}, '<') > 0 AND instr({col}, '>') > 0 "
                    f"AND instr({col}, '</') > 0")
    else:
        pdf_prefix = (f"CASE WHEN {col} LIKE '{PDF_PREFIX}%' "
                      f"THEN 1 ELSE 0 END")
        b64_ok = f"regexp_matches({body}, '^[A-Za-z0-9+/]*={{0,2}}$')"
        last_lt = f"(length({s}) - strpos(reverse({s}), '<') + 1)"
        last_gt = f"(length({s}) - strpos(reverse({s}), '>') + 1)"
        has_lt = f"strpos({s}, '<') > 0"
        has_gt = f"strpos({s}, '>') > 0"
        has_close = f"strpos({s}, '</') > 0"
        contains = (f"strpos({col}, '<') > 0 AND strpos({col}, '>') > 0 "
                    f"AND strpos({col}, '</') > 0")
    nonprint = (f"length(regexp_replace({s}, "
                r"'[\x20-\x7E\t\n\r]', '', 'g'))"
                if dialect == "duckdb" else
                f"length(regexp_replace({s}, "
                r"'[\\x20-\\x7E\\t\\n\\r]', ''))")
    return {
        "f_empty": f"CASE WHEN length({s}) = 0 THEN 1 ELSE 0 END",
        "f_pdf_prefix": pdf_prefix,
        "f_pdf_magic": (f"CASE WHEN {col} LIKE '{PDF_PREFIX}JVBE%' "
                        f"THEN 1 ELSE 0 END"),
        "f_b64_clean": (f"CASE WHEN ({pdf_prefix}) = 1 "
                        f"AND length({body}) % 4 = 0 "
                        f"AND ({b64_ok}) THEN 1 ELSE 0 END"),
        "f_html_doc": (f"CASE WHEN lower({s}) LIKE '<!doctype%' "
                       f"OR lower({s}) LIKE '<html%' THEN 1 ELSE 0 END"),
        "f_angle_pair": f"CASE WHEN {contains} THEN 1 ELSE 0 END",
        "f_unterm": (f"CASE WHEN ({has_lt}) AND (NOT ({has_gt}) "
                     f"OR {last_lt} > {last_gt}) THEN 1 ELSE 0 END"),
        "f_no_close": (f"CASE WHEN ({has_lt}) AND ({has_gt}) "
                       f"AND NOT ({has_close}) THEN 1 ELSE 0 END"),
        # exact integer division ('//' / 'div') — float '/' then floor
        # can land one ulp under an exact quotient and floor off by one
        "f_nonprint_bp": (f"CASE WHEN length({s}) = 0 THEN 0 ELSE "
                          f"CAST((10000 * ({nonprint})) // length({s}) "
                          f"AS BIGINT) END"
                          if dialect == "duckdb" else
                          f"CASE WHEN length({s}) = 0 THEN 0 ELSE "
                          f"CAST((10000 * ({nonprint})) div length({s}) "
                          f"AS BIGINT) END"),
        "f_len_log2": f"CAST(length(bin(length({s}) + 1)) - 1 AS BIGINT)",
    }


def score_sql(col: str, dialect: str,
              bias: int | None = None,
              weights: list[int] | None = None) -> str:
    """The integer score as one SQL expression (weights inlined as
    plan-time literals — the hyperplane lesson: Catalyst constant-folds
    literal multipliers; a broadcast-join of 10 coefficients would add
    a join for nothing)."""
    b = TRAINED_BIAS_MICRO if bias is None else bias
    w = TRAINED_WEIGHTS_MICRO if weights is None else weights
    feats = feature_sql(col, dialect)
    terms = [f"CAST({b} AS BIGINT)"]
    terms += [f"({wi}) * ({feats[name]})"
              for name, wi in zip(FEATURES, w) if wi]
    return "(" + " + ".join(terms) + ")"
