"""Vectorized UDFs wiring the pure-Python core into Spark.

All Python execution is Arrow-batched (``mapInPandas`` /
``pandas_udf``) — no row-at-a-time Python UDFs anywhere
(BASELINE.json:15). The extraction UDF is the pipeline's only heavy
Python stage; everything downstream is native Catalyst expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..core.blocks import STATUS_OK
from ..core.dates import detect_date_entities
from ..core.extract import extract_payload
from . import schemas


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (conv_id, turn_idx, role, tool, ts, text)
    -> EXTRACTED_SCHEMA rows. Replaces the reference's per-document
    Textract Lambda (fn-call-textract/main.py:52-61) with a columnar
    batch stage."""
    for pdf in batches:
        out = {
            "conv_id": pdf["conv_id"], "turn_idx": pdf["turn_idx"],
            "role": pdf.get("role"), "tool": pdf.get("tool"),
            "ts": pdf.get("ts"),
            "status": [], "kind": [], "main_text": [], "spans": [],
            "span_domain": [], "blocks": [],
        }
        for text in pdf["text"]:
            res = extract_payload(text if isinstance(text, str) else "")
            out["status"].append(res.status)
            out["kind"].append(res.kind)
            out["main_text"].append(res.main_text)
            out["spans"].append(
                [{"start": a, "end": b} for a, b in res.spans])
            out["span_domain"].append(res.span_domain)
            out["blocks"].append(res.blocks)
        yield pd.DataFrame(out)


def extract_turns(transcripts: DataFrame, salt: int = 16,
                  partitions: int | None = None) -> DataFrame:
    """Quality-gate + extract every turn.

    Explicit salted repartition on (conv_id, salt(turn_idx)) first so
    a single hot conversation (10^6-turn agent transcripts) spreads
    over ``salt`` tasks instead of one straggler (north rule skew
    handling; SURVEY.md §4.3). The extraction itself is a narrow
    map — after this exchange the whole extract->rules path is
    shuffle-free.
    """
    cols = [c for c in ("conv_id", "turn_idx", "role", "tool", "ts", "text")
            if c in transcripts.columns]
    df = transcripts.select(*cols)
    if partitions:
        df = df.repartition(
            partitions, F.col("conv_id"),
            F.pmod(F.xxhash64("turn_idx"), F.lit(salt)))
    else:
        df = df.repartition(
            F.col("conv_id"), F.pmod(F.xxhash64("turn_idx"), F.lit(salt)))
    return df.mapInPandas(_extract_batches, schema=schemas.EXTRACTED_SCHEMA)


@F.pandas_udf(schemas.ENTITY_SCHEMA)
def detect_date_entities_udf(texts: pd.Series) -> pd.Series:
    """Comprehend-fallback analog (fn-postprocess/main.py:104-117).
    Called with '' for rows that already have KV date candidates (the
    caller gates the input — Spark evaluates extracted Python UDF
    nodes unconditionally, so the gate must be in the argument, not
    around the call; SURVEY.md §4.1 fallback short-circuit)."""
    return texts.map(
        lambda t: [
            {"text": e["text"], "score": float(e["score"]),
             "start": e["start"]}
            for e in detect_date_entities(t)
        ] if t else [])


@F.pandas_udf(DoubleType())
def python_float_udf(values: pd.Series) -> pd.Series:
    """Exact Python float() semantics for the reference's numeric
    predicate (fn-postprocess/main.py:74-91): used only in tests to
    cross-check that Spark's try_cast matches on the value domain."""
    def f(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None
    return values.map(f)


def blocks_table(extracted: DataFrame) -> DataFrame:
    """Exploded, columnar blocks DataFrame (SURVEY.md §1.2) — used for
    checkpointed materialization + metrics; the field rules consume
    the nested array directly (no shuffle)."""
    return (
        extracted
        .filter(F.col("status") == STATUS_OK)
        .select("conv_id", "turn_idx",
                F.explode("blocks").alias("b"))
        .select("conv_id", "turn_idx", "b.*")
    )
