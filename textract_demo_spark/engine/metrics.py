"""Per-partition extraction metrics for lineage manifests (A12,
north rule: "per-partition lineage + metrics (blocks kept/dropped,
confidence histograms)"; the reference analog is the notification/
observability path, SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tables import PART_COL


def partition_metrics(staged: DataFrame) -> dict[int, dict]:
    """Compute manifest metrics per partition from the staged
    extraction output (one columnar pass over freshly written data).

    Returns {part_key: {rows, ok, rejected, needs_review, blocks_kept,
    blocks_dropped, conf_histogram}}.
    """
    has_blocks = "blocks" in staged.columns
    aggs = [
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("status") != "ok", 1).otherwise(0))
         .alias("rejected"),
    ]
    if "needs_review" in staged.columns:
        aggs.append(F.sum(F.when(F.col("needs_review"), 1).otherwise(0))
                    .alias("needs_review"))
    if has_blocks:
        aggs += [
            F.sum(F.expr("size(filter(blocks, b -> b.is_content))"))
             .alias("blocks_kept"),
            F.sum(F.expr("size(filter(blocks, b -> NOT b.is_content))"))
             .alias("blocks_dropped"),
        ]
        # 10-bucket confidence histogram as 10 plain sums — scales as
        # partial+final hash agg, no collect_list / explode blow-up
        aggs += [
            F.sum(F.expr(
                "size(filter(blocks, b -> b.is_content AND "
                f"int(least(greatest(b.conf, 0.0d), 99.99d) / 10) = {i}))"
            )).alias(f"hist_{i}")
            for i in range(10)
        ]
    rows = staged.groupBy(PART_COL).agg(*aggs).collect()
    out: dict[int, dict] = {}
    for r in rows:
        d = r.asDict()
        k = d.pop(PART_COL)
        hist = [d.pop(f"hist_{i}", 0) for i in range(10)]
        if has_blocks:
            d["conf_histogram"] = [int(h or 0) for h in hist]
        out[int(k)] = d
    return out
