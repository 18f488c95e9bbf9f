"""Document chunking for training-data pipelines: split long
documents into fixed-size token windows with overlap (the standard
context-window packing precursor — long transcripts/documents become
`size`-token chunks that stride by `stride`, so consecutive chunks
share ``size - stride`` tokens of context).

Pure narrow per-row algebra: normalize whitespace, split, explode a
``sequence(0, n-1, stride)`` of chunk starts, slice. Zero shuffle —
at 10^12 turns this is a map-only stage that pipelines straight into
the pack/tokenize stages, and Catalyst keeps the scan pruned to
(id, text). Chunk starts are data-independent, so the output is
deterministic and DuckDB-replayable token-for-token (the oracle
replays the same slice algebra with ``generate_series`` + list
slicing).

Reference analog: the demo splits multi-page documents into per-page
Textract units (async path, fn-call-textract/main.py:62-97); chunking
generalizes that "one long payload → bounded processing units" step
to token windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_with_overlap(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", size: int = 64,
                       stride: int = 48) -> DataFrame:
    """One row per (doc, chunk): chunk_idx, n_chunk_tokens,
    chunk_text. Chunks start at 0, stride, 2·stride, … ≤ n-1; the
    final chunk may be short. Empty/whitespace-only documents yield
    zero chunks. ``stride <= size`` gives full coverage (every token
    appears in ≥1 chunk — property-tested); ``stride < size``
    additionally overlaps consecutive chunks by ``size - stride``
    tokens.
    """
    if not 1 <= stride <= size:
        raise ValueError(f"need 1 <= stride <= size, got "
                         f"stride={stride} size={size}")
    norm = f"trim(regexp_replace({text_col}, '\\\\s+', ' '))"
    return (df
            .select(id_col, F.expr(norm).alias("_t"))
            .filter(F.col("_t") != "")
            .select(id_col, F.expr("split(_t, ' ')").alias("_toks"))
            .select(id_col, "_toks",
                    F.explode(F.expr(
                        f"sequence(0, size(_toks) - 1, {stride})"))
                    .alias("_start"))
            .select(
                id_col,
                F.expr(f"_start div {stride}").cast("long")
                .alias("chunk_idx"),
                F.expr(f"slice(_toks, _start + 1, {size})").alias("_c"))
            .select(
                id_col, "chunk_idx",
                F.size("_c").cast("long").alias("n_chunk_tokens"),
                F.array_join("_c", " ").alias("chunk_text")))
