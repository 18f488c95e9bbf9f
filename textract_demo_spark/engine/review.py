"""Human-review override — the batch analog of the reference's
waitForTaskToken callback loop.

Reference semantics: the state machine parks on human review
(StateMachine.asl.json:66-82), the callback returns
{Date, Total, Vendor, WorkerId} (fn-human-review-callback/main.py:71-79),
and the client REPLACES the model result wholesale when a HumanReview
key is present — per-field Confidence := 1 if value truthy else 0 (on
its 0-1 scale; ours is 0-100), composite := 1, Reviewer := WorkerId
(SmartOCR.vue:190-211). In Spark this is a left outer equi-join against
the reviews table; the reviews side is small (only low-confidence turns
are ever reviewed) so it broadcasts (J3, SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _field(src: str) -> str:
    """HumanReview field: conf 100 if non-empty else 0, value verbatim
    (SmartOCR.vue:196-199, scaled to the engine's 0-100 convention)."""
    return (f"named_struct('confidence',"
            f" if({src} IS NOT NULL AND {src} != '', 100.0d, 0.0d),"
            f" 'value', coalesce({src}, ''))")


def apply_reviews(results: DataFrame, reviews: DataFrame,
                  broadcast_reviews: bool = True) -> DataFrame:
    """Left-join review overrides onto model results.

    Adds ``final_result`` (= review override when present, else
    model_result fields), ``reviewed`` and ``reviewer``. Turns that
    needed review but have no review row stay ``needs_review=true``
    (the reference's 3600s-timeout analog, SURVEY.md §2.9 T3).
    """
    r = reviews.select(
        "conv_id", "turn_idx",
        F.col("vendor").alias("_rev_vendor"),
        F.col("date").alias("_rev_date"),
        F.col("total").alias("_rev_total"),
        F.col("worker_id").alias("_rev_worker"))
    if broadcast_reviews:
        r = F.broadcast(r)
    joined = results.join(r, ["conv_id", "turn_idx"], "left")
    return (
        joined
        .withColumn("reviewed", F.col("_rev_worker").isNotNull())
        .withColumn("reviewer", F.col("_rev_worker"))
        .withColumn("final_result", F.expr(f"""
            CASE
              WHEN _rev_worker IS NOT NULL THEN named_struct(
                'date', {_field('_rev_date')},
                'total', {_field('_rev_total')},
                'vendor', {_field('_rev_vendor')},
                'confidence', 100.0d)
              WHEN model_result IS NOT NULL THEN named_struct(
                'date', named_struct(
                    'confidence', model_result.date.confidence,
                    'value', model_result.date.value),
                'total', named_struct(
                    'confidence', model_result.total.confidence,
                    'value', model_result.total.value),
                'vendor', named_struct(
                    'confidence', model_result.vendor.confidence,
                    'value', model_result.vendor.value),
                'confidence', model_result.confidence)
              ELSE null
            END"""))
        .drop("_rev_vendor", "_rev_date", "_rev_total", "_rev_worker")
    )
