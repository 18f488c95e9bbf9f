"""Skew handling: the explicit salted repartition must spread one hot
conversation over ~salt partitions instead of one straggler (north
rule axis A; SURVEY.md §4.3, watch-list #3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from textract_demo_spark.engine import schemas


def _distribution(df, salt: int, partitions: int):
    from textract_demo_spark.engine.udfs import extract_turns
    # reuse the pipeline's exact exchange, then observe physical
    # partition ids BEFORE the Python stage
    sel = df.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
    rep = sel.repartition(partitions, F.col("conv_id"),
                          F.pmod(F.xxhash64("turn_idx"), F.lit(salt)))
    return (rep.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect())


def test_salting_spreads_hot_conversation(spark):
    # one pathological conversation with 20k turns + 50 tiny ones
    hot = spark.range(20000).select(
        F.lit("conv-hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("payload "), F.col("id")).alias("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"))
    cold = spark.range(50).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("small").alias("text"),
        F.lit("").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"))
    df = hot.unionByName(cold)

    salt, partitions = 16, 16
    rows = _distribution(df, salt, partitions)
    counts = {r["pid"]: r["count"] for r in rows}
    total = sum(counts.values())
    assert total == 20050
    # WITH salting the hot conversation spreads. Salt values collide
    # in partitions (balls-in-bins: a 16-salt/16-partition split puts
    # up to ~4 buckets in one partition), so assert the guarantees
    # that matter: the straggler shrinks at least 4x vs unsalted, and
    # at least half the salt buckets carry real load.
    assert max(counts.values()) <= 20000 // 4, counts
    assert sum(1 for c in counts.values() if c > 500) >= salt // 2, counts

    # control: WITHOUT the salt term everything lands in few partitions
    sel = df.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
    unsalted = (sel.repartition(partitions, F.col("conv_id"))
                .withColumn("pid", F.spark_partition_id())
                .groupBy("pid").count().collect())
    un_max = max(r["count"] for r in unsalted)
    assert un_max >= 20000  # the hot conv is one straggler partition
