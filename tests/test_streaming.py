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


def test_streaming_incremental_dedup_matches_batch_and_resumes(spark, dirs):
    """Each micro-batch probes the frozen index like one batch-mode
    incremental_dedup_pairs call; the vs-corpus relation set over all
    waves equals the batch form's, and a re-drain with the same
    checkpoint and no new files reprocesses nothing (idempotent
    per-batch-id output)."""
    from textract_demo_spark.datapipe.dedup import (
        build_minhash_index, incremental_dedup_pairs, release_cached)
    from textract_demo_spark.streaming.stream import start_incremental_dedup
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = (docs.filter(F.col("doc_id") % 3 == 0)
             .unionByName(
                 corpus.filter(F.col("doc_id") % 5 == 1)
                 .select((F.col("doc_id") + 1000000).alias("doc_id"),
                         F.concat("text", F.lit(" tail noise"))
                          .alias("text"))))
    idx = build_minhash_index(corpus, num_hashes=32).persist()
    _write_chunk(batch.filter(F.col("doc_id") % 2 == 0), dirs["in"], "a")
    _write_chunk(batch.filter(F.col("doc_id") % 2 == 1), dirs["in"], "b")

    def drain():
        stream = (spark.readStream.schema(batch.schema)
                  .option("maxFilesPerTrigger", 1).parquet(dirs["in"]))
        q = start_incremental_dedup(stream, idx, dirs["out"],
                                    dirs["ckpt"], num_hashes=32,
                                    bands=16, threshold=0.5)
        assert q.awaitTermination(300)
        return spark.read.parquet(dirs["out"])
    out1 = drain()
    got = {(r["doc_id"], r["match_id"])
           for r in out1.filter("match_src = 'corpus'").collect()}
    ref = incremental_dedup_pairs(batch, idx, threshold=0.5,
                                  num_hashes=32, bands=16)
    want = {(r["doc_id"], r["match_id"])
            for r in ref.filter("match_src = 'corpus'").collect()}
    release_cached(ref)
    assert got == want and len(want) > 0
    n1 = out1.count()
    assert drain().count() == n1  # no reprocessing on resume
    idx.unpersist()


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


def test_cdc_upsert_last_wins_and_replay_idempotent(spark, tmp_path):
    """Cross-batch CDC semantics: a second drain with updates for the
    same keys overwrites (last-writer-wins), and a REPLAYED batch
    (foreachBatch at-least-once) converges to one copy per key
    because upsert's delete tombstones the earlier replay's rows."""
    import os

    from pyspark.sql import functions as F

    from textract_demo_spark.engine.tables import (IcebergLike,
                                                   with_part_key)
    from textract_demo_spark.streaming.stream import start_cdc_upsert

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def stage(name, rows):
        df = spark.createDataFrame(rows, "doc_id long, ts long, v long")
        p = tmp_path / f"stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(p))
        for i, f in enumerate(sorted(os.listdir(p))):
            if f.endswith(".parquet"):
                os.rename(p / f, in_dir / f"{name}-{i}.parquet")

    def drain(table):
        stream = (spark.readStream
                  .schema("doc_id long, ts long, v long")
                  .parquet(str(in_dir)))
        q = start_cdc_upsert(stream, table, ["doc_id"],
                             str(tmp_path / "ckpt"), ts_col="ts")
        assert q.awaitTermination(300)

    table = IcebergLike(str(tmp_path / "t"))
    stage("w1", [(i, 1, i * 10) for i in range(20)])
    drain(table)
    got = {r.doc_id: r.v for r in
           table.read(spark).select("doc_id", "v").collect()}
    assert got == {i: i * 10 for i in range(20)}

    # second wave: same keys, new values -> checkpointed stream picks
    # up ONLY the new file; later batch wins
    stage("w2", [(i, 2, i * 100) for i in range(0, 20, 2)])
    drain(table)
    got = {r.doc_id: r.v for r in
           table.read(spark).select("doc_id", "v").collect()}
    want = {i: (i * 100 if i % 2 == 0 else i * 10) for i in range(20)}
    assert got == want

    # replayed batch: re-applying an identical upsert converges
    replay = (spark.createDataFrame(
                  [(i, 2, i * 100) for i in range(0, 20, 2)],
                  "doc_id long, ts long, v long"))
    table.upsert(with_part_key(replay, 8, col="doc_id"), ["doc_id"])
    got2 = {r.doc_id: r.v for r in
            table.read(spark).select("doc_id", "v").collect()}
    assert got2 == want  # one copy per key, same values
