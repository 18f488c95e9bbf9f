"""Large-scale training-data pipeline operators: deduplication,
similarity search, text analysis, multimodal column plumbing.

These are engine extras beyond the reference's operator surface
(SURVEY.md §2 note) — the ops a 100 TB training-data pipeline needs
around the extraction core. All implemented as native DataFrame
ops; Python only where an algorithm genuinely needs it.
"""
