"""Human-review override — the batch analog of the reference's
waitForTaskToken callback loop.

Reference semantics: the state machine parks on human review
(StateMachine.asl.json:66-82), the callback returns
{Date, Total, Vendor, WorkerId} plus an optional Tax answer
(fn-human-review-callback/main.py:71-79; the form collects vendor,
date, total and optional tax — a2i-text-with-checkboxes.liquid.html),
and the client REPLACES the model result wholesale when a HumanReview
key is present — per-field Confidence := 1 if value truthy else 0 (on
its 0-1 scale; ours is 0-100), composite := 1, Reviewer := WorkerId
(SmartOCR.vue:190-211). In Spark this is a left outer equi-join against
the reviews table; the reviews side is small (only low-confidence turns
are ever reviewed) so it broadcasts (J3, SURVEY.md §2.4).

Ingestion hygiene (P10/P11): the reference callback skips non-.json
keys (fn-human-review-callback/main.py:46-50) and records without a
task token (main.py:56-59), and sends a typed task FAILURE for
malformed review answers (ReviewFailed/MalformedReviewResponse,
main.py:24-30,81-96) — which fails the execution. ``ingest_reviews``
reproduces all three paths: drop, drop, and a ``failed`` set that
marks the turn's status ``review_failed``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.blocks import STATUS_REVIEW_FAILED

REVIEW_COLS = ["conv_id", "turn_idx", "vendor", "date", "total", "tax",
               "worker_id", "review_ts"]


def ingest_reviews(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Hygiene-filter a raw review feed into (valid, failed).

    - rows whose ``source_key`` is present but not ``*.json`` are
      DROPPED silently (P10 suffix filter, main.py:46-50);
    - rows with a null/empty ``task_token`` are DROPPED (P11 guard,
      main.py:56-59 — without the token the waiting execution cannot
      be correlated);
    - correlatable rows whose answers are unusable (no worker id, or
      every answer field null) go to ``failed`` — the
      ReviewFailed/MalformedReviewResponse path (main.py:24-30,81-96):
      the turn's execution fails rather than silently succeeding;
    - everything else is ``valid``, projected to REVIEWS_SCHEMA shape.
    """
    kept = raw
    if "source_key" in raw.columns:
        kept = kept.filter(F.col("source_key").isNull()
                           | F.col("source_key").endswith(".json"))
    if "task_token" in raw.columns:
        kept = kept.filter(F.col("task_token").isNotNull()
                           & (F.col("task_token") != ""))
    if "tax" not in kept.columns:
        kept = kept.withColumn("tax", F.lit(None).cast("string"))
    malformed = ((F.col("worker_id").isNull()) | (F.col("worker_id") == "")
                 | (F.col("vendor").isNull() & F.col("date").isNull()
                    & F.col("total").isNull()))
    valid = kept.filter(~malformed).select(*REVIEW_COLS)
    failed = kept.filter(malformed).select("conv_id", "turn_idx")
    return valid, failed


def _field(src: str) -> str:
    """HumanReview field: conf 100 if non-empty else 0, value verbatim
    (SmartOCR.vue:196-199, scaled to the engine's 0-100 convention)."""
    return (f"named_struct('confidence',"
            f" if({src} IS NOT NULL AND {src} != '', 100.0d, 0.0d),"
            f" 'value', coalesce({src}, ''))")


def apply_reviews(results: DataFrame, reviews: DataFrame,
                  failed_reviews: DataFrame | None = None,
                  broadcast_reviews: bool = True) -> DataFrame:
    """Left-join review overrides onto model results.

    Adds ``final_result`` (= review override when present, else
    model_result fields; the review branch also carries the optional
    ``tax`` answer — the model never produces one, so the model branch
    holds the empty field), ``reviewed`` and ``reviewer``. Turns that
    needed review but have no review row stay ``needs_review=true``
    (the reference's 3600s-timeout analog, SURVEY.md §2.9 T3). When a
    ``failed_reviews`` (conv_id, turn_idx) set is given, unreviewed
    matching turns get ``status='review_failed'`` (the task-failure
    path)."""
    r = reviews.select(
        "conv_id", "turn_idx",
        F.col("vendor").alias("_rev_vendor"),
        F.col("date").alias("_rev_date"),
        F.col("total").alias("_rev_total"),
        (F.col("tax") if "tax" in reviews.columns
         else F.lit(None).cast("string")).alias("_rev_tax"),
        F.col("worker_id").alias("_rev_worker"))
    if broadcast_reviews:
        r = F.broadcast(r)
    joined = results.join(r, ["conv_id", "turn_idx"], "left")
    out = (
        joined
        .withColumn("reviewed", F.col("_rev_worker").isNotNull())
        .withColumn("reviewer", F.col("_rev_worker"))
        .withColumn("final_result", F.expr(f"""
            CASE
              WHEN _rev_worker IS NOT NULL THEN named_struct(
                'date', {_field('_rev_date')},
                'total', {_field('_rev_total')},
                'vendor', {_field('_rev_vendor')},
                'tax', {_field('_rev_tax')},
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
                'tax', named_struct('confidence', 0.0d, 'value', ''),
                'confidence', model_result.confidence)
              ELSE null
            END"""))
        .drop("_rev_vendor", "_rev_date", "_rev_total", "_rev_tax",
              "_rev_worker")
    )
    if failed_reviews is not None:
        fr = F.broadcast(failed_reviews.select(
            "conv_id", "turn_idx",
            F.lit(True).alias("_rev_failed")).distinct())
        out = (out.join(fr, ["conv_id", "turn_idx"], "left")
               .withColumn("status", F.expr(
                   f"if(_rev_failed AND NOT reviewed,"
                   f" '{STATUS_REVIEW_FAILED}', status)"))
               .drop("_rev_failed"))
    return out
