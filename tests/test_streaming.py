"""Streaming mode: batch-equivalence, checkpoint resume (exactly-once
file sink), and late-duplicate suppression (SURVEY.md §2.9 T1/T2/T5)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.engine.pipeline import (RESULT_COLUMNS,
                                                 fixtures_to_dfs,
                                                 run_pipeline)
from textract_demo_spark.streaming.stream import (read_transcripts_stream,
                                                  start_to_parquet,
                                                  streaming_pipeline)

RESULT_FLAT = ["conv_id", "turn_idx", "status", "kind", "main_text"]


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _write_chunk(df, in_dir, name):
    """Stage one parquet file and drop it flat into the watched dir
    (the file stream source does not recurse into subdirectories)."""
    stage = os.path.join(in_dir, f".stage-{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    n = 0
    for f in sorted(os.listdir(stage)):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f),
                        os.path.join(in_dir, f"chunk-{name}-{n}.parquet"))
            n += 1
    shutil.rmtree(stage)


def _drain(spark, dirs):
    stream = read_transcripts_stream(spark, dirs["in"])
    # watermark wider than the fixtures' event-time spread: chunks
    # arriving in later micro-batches must not be treated as late
    results = streaming_pipeline(stream, salt=4, watermark="3650 days")
    q = start_to_parquet(results, dirs["out"], dirs["ckpt"])
    q.awaitTermination(300)
    return spark.read.schema(
        spark.createDataFrame([], results.schema).schema
    ).parquet(dirs["out"])


def test_stream_matches_batch_and_resumes(spark, dirs):
    dfs = fixtures_to_dfs(spark, n_convs=12)
    t = dfs["transcripts"]
    first = t.filter(F.xxhash64("conv_id") % 2 == 0)
    second = t.filter(F.xxhash64("conv_id") % 2 != 0)

    # -- run 1: only the first chunk exists
    _write_chunk(first, dirs["in"], "a")
    out1 = _drain(spark, dirs).select(*RESULT_FLAT).collect()
    exp1 = (run_pipeline(first, reviews=None, salt=4)
            .select(*RESULT_FLAT).collect())
    assert sorted(map(tuple, out1)) == sorted(map(tuple, exp1))

    # -- run 2: new files arrive; checkpoint resume processes ONLY them
    _write_chunk(second, dirs["in"], "b")
    out2 = _drain(spark, dirs).select(*RESULT_FLAT).collect()
    exp_all = (run_pipeline(t, reviews=None, salt=4)
               .select(*RESULT_FLAT).collect())
    assert sorted(map(tuple, out2)) == sorted(map(tuple, exp_all))
    # no duplicates from re-processing chunk a
    assert len(out2) == len(exp_all)


def test_stream_drops_late_duplicate_turns(spark, dirs):
    dfs = fixtures_to_dfs(spark, n_convs=6)
    t = dfs["transcripts"]
    # duplicate every turn of one conversation (re-delivered events)
    one = t.filter(F.col("conv_id") == "conv-000000")
    _write_chunk(t, dirs["in"], "a")
    _write_chunk(one, dirs["in"], "dup")
    out = _drain(spark, dirs)
    keys = out.groupBy("conv_id", "turn_idx").count()
    assert keys.filter(F.col("count") > 1).count() == 0
    assert out.count() == t.count()
