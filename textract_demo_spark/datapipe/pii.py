"""PII detection and redaction for training-data pipelines: typed
regex detectors (email, phone, IPv4, SSN-like, card-like) producing
per-document counts, and a redactor that replaces each match with a
typed placeholder token.

Beyond-reference training-pipeline operators (like the rest of
``datapipe``): a corpus headed for model training is scrubbed of
contact info / identifiers BEFORE tokenization, and the per-type
counts feed the quality/routing tables the same way
``textstats.with_quality_score`` does.

Scale notes (the design constraints at 10^12 docs):
- pure per-row JVM regex (``regexp_extract_all`` / ``regexp_replace``
  builtins) — zero shuffles, zero state, whole-stage codegen; the
  operator costs one scan at any corpus size.
- patterns are deliberately restricted to the RE2-compatible subset
  (no backreferences, no lookaround) so the SAME pattern string runs
  identically on Spark's Java regex and on RE2 engines (DuckDB,
  Go/Rust scrubbers) — the property that makes the redaction
  cross-engine reproducible and DuckDB-oracleable.
- redaction applies patterns in a FIXED order (most-specific first)
  so overlapping matches resolve deterministically; placeholders
  contain no digits, so later numeric patterns can never re-match
  inside an earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: most-specific first. Values are (pattern, placeholder).
# RE2-compatible subset only — keep it that way (see module doc).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "card": (r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def with_pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-type match counts over the ORIGINAL text (detection is
    independent per type; counts answer "what would redaction
    remove"), plus ``n_pii`` total and a ``has_pii`` routing flag."""
    out = docs
    for name, (pat, _) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat),
                                        F.lit(0)))
             .cast("long"))
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return (out.withColumn("n_pii", total.cast("long"))
               .withColumn("has_pii", F.col("n_pii") > 0))


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Replace every PII match with its typed placeholder, applying
    patterns in ``PII_PATTERNS`` order (most-specific first)."""
    col: Column = F.col(text_col)
    for _, (pat, repl) in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, repl)
    return docs.withColumn(out_col, col)
