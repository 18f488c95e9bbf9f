"""Learned quality gate — Spark application of the trained scorer.

The reference's gate is a TRAINED Rekognition custom-labels model
(``source/ocr/preprocessing/README.md:46-57``; inference at
``fn-preprocess/main.py:117-146``). ``core/quality_model.py`` trains
the analog (logistic over payload-shape features, integer-quantized);
this module applies it as pure narrow Spark SQL — zero shuffles, zero
Python in the hot path, whole-stage-codegen friendly — so the gate
runs at scan speed on 10^12 turns. Coefficients are inlined as
plan-time literals (a broadcast coefficient table would buy a join
for a 10-term dot product; Catalyst constant-folds the literals
instead — same trade as the sign-LSH hyperplanes in
datapipe/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_learned_quality(df: DataFrame, text_col: str = "text",
                         bias: int | None = None,
                         weights: list[int] | None = None) -> DataFrame:
    """Add ``learned_score_micro`` (BIGINT) and ``learned_label``
    ('good'/'bad', accept iff score >= 0) under the frozen model —
    or an explicitly retrained ``(bias, weights)`` from
    ``core.quality_model.train_quality_scorer`` (the "improve the
    gate with new labelled data" path the reference gets by
    retraining its custom-labels model)."""
    from ..core.quality_model import score_sql
    expr = score_sql(text_col, "spark", bias=bias, weights=weights)
    return (df
            .withColumn("learned_score_micro", F.expr(expr))
            .withColumn("learned_label",
                        F.when(F.col("learned_score_micro") >= 0,
                               F.lit("good")).otherwise(F.lit("bad"))))
