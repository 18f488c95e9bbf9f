"""SparkSession factory with the engine's standard configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 1024  # bound Arrow batch rows: fixture payloads are ~1-4KB
                    # => ~4MB/batch; cap maxRecordsPerBatch so U-2 batches
                    # stay << executor memory at 10^12 scale (SURVEY.md §4.2)


def get_spark(master: str | None = None, app: str = "textract_demo_spark",
              shuffle_partitions: int | None = None,
              extra: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        cores = master[master.find("[") + 1:master.find("]")] \
            if "[" in master else "32"
        shuffle_partitions = (os.cpu_count() or 32) if cores == "*" \
            else int(cores)
    b = (
        SparkSession.builder
        .master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH))
        .config("spark.ui.enabled", "false")
        # bound plan-string rendering: multi-stage jobs whose stages
        # self-join derived frames back (curation) grow plan TREES
        # exponentially, and the execution-start event renders the
        # plan to a string on every action — unbounded, that string
        # alone OOMed a 1g driver (StringConcat in explainString)
        .config("spark.sql.maxPlanStringLength", str(1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
