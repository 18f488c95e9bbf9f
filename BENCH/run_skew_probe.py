"""Skew-spread manifest probe: runs the skew_salted_extract input
shape (one zipf-hot conversation, 10^5 turns at sf0.01 scale) through
the REAL extract_turns exchange at several salt factors and records
the per-task row-count histogram + spread metrics to
BENCH/SKEW_SPREAD.json — the documented evidence behind the north
rule's "salted repartitioning defuses long-conversation skew" claim
(driver-verified as booleans by the skew_salted_extract query; this
file carries the raw numbers).

Usage: python BENCH/run_skew_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from textract_demo_spark.engine.session import get_spark
    from textract_demo_spark.engine.udfs import extract_turns

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[32]", app="skew_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hot = docs.select(
        F.lit("conv-hot").alias("conv_id"),
        F.explode(F.sequence(
            F.col("doc_id").cast("int") * 200,
            F.col("doc_id").cast("int") * 200 + 199)).alias("turn_idx"),
        F.lit("user").alias("role"), F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"))
    cold = docs.filter(F.col("doc_id") < 50).select(
        F.concat(F.lit("conv-"), F.col("doc_id").cast("string"))
         .alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"), F.col("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"))
    turns = hot.unionByName(cold)

    record: dict = {"sf_dir": sf_dir, "partitions": 32, "sweeps": []}
    for salt in (1, 4, 16, 64):
        rows = (extract_turns(turns, salt=salt, partitions=32)
                .withColumn("pid", F.spark_partition_id())
                .filter(F.col("conv_id") == "conv-hot")
                .groupBy("pid").count().collect())
        counts = sorted((int(r["count"]) for r in rows), reverse=True)
        total = sum(counts)
        record["sweeps"].append({
            "salt": salt,
            "hot_rows": total,
            "tasks_used": len(counts),
            "max_task_rows": counts[0],
            "min_task_rows": counts[-1],
            "max_over_ideal": round(counts[0] / (total / max(salt, 1)), 3),
            "histogram": counts,
        })
        print(f"salt={salt}: tasks={len(counts)} max={counts[0]} "
              f"spread={counts}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SKEW_SPREAD.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
