"""Compaction (IcebergLike.compact): small-file rollup must preserve
every row, shrink file counts, survive a kill between its two swap
renames, and leave manifests/snapshots consistent."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.engine.tables import (PART_COL, IcebergLike,
                                               with_part_key)


def _small_file_table(spark, tmp_path, buckets=4):
    """A committed table where every partition has MANY small files
    (rebalance off + wide repartition = tasks x buckets files)."""
    df = with_part_key(
        spark.range(0, 400)
        .select(F.concat(F.lit("c"), F.col("id").cast("string"))
                .alias("conv_id"),
                (F.col("id") % 7).alias("v")),
        buckets).repartition(8)
    table = IcebergLike(str(tmp_path / "t"))
    table.write(df, rebalance=False)
    return table


def _files(table, k):
    d = os.path.join(table.data_dir, f"{PART_COL}={k}")
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def test_compact_shrinks_files_preserves_rows(spark, tmp_path):
    table = _small_file_table(spark, tmp_path)
    before = {k: _files(table, k) for k in table.committed_keys()}
    assert all(len(v) > 1 for v in before.values())
    rows_before = sorted(
        table.read(spark).select("conv_id", "v").collect())

    snap = table.compact(spark)
    assert snap["op"] == "compact"
    assert sorted(snap["compacted_keys"]) == sorted(before)
    assert snap["files_after"] < snap["files_before"]
    for k in before:
        after = _files(table, k)
        assert len(after) < len(before[k])
        m = table.manifest(k)
        assert m["files"] == after  # manifest tracks the new files
        assert m["files_before_compaction"] == len(before[k])
    assert sorted(table.read(spark)
                  .select("conv_id", "v").collect()) == rows_before
    # idempotent: nothing left >= min_files at this size
    again = table.compact(spark, min_files=64)
    assert again["compacted_keys"] == []


def test_compact_time_travel_keeps_partition_set(spark, tmp_path):
    table = _small_file_table(spark, tmp_path)
    n = table.read(spark, snapshot_id=0).count()
    table.compact(spark)
    # documented deviation: time travel preserves the partition SET
    # (and every row), not the physical file list
    assert table.read(spark, snapshot_id=0).count() == n


def test_compact_crash_between_renames_recovers(spark, tmp_path):
    table = _small_file_table(spark, tmp_path)
    rows = sorted(table.read(spark).select("conv_id", "v").collect())
    with pytest.raises(RuntimeError, match="injected failure"):
        table.compact(spark, fail_after_first_rename=1,
                      run_id="compact-crash")
    # the wounded partition exists only as .old right now
    assert any(".old-" in d for d in os.listdir(table.data_dir))

    reopened = IcebergLike(table.root)  # recovery runs on open
    assert not any(".old-" in d for d in os.listdir(reopened.data_dir))
    assert sorted(reopened.read(spark)
                  .select("conv_id", "v").collect()) == rows
    # the redo completes and leaves a consistent snapshot
    snap = reopened.compact(spark)
    assert sorted(snap["compacted_keys"]) != []
    assert sorted(reopened.read(spark)
                  .select("conv_id", "v").collect()) == rows


def test_compact_snapshot_readable_by_id(spark, tmp_path):
    table = _small_file_table(spark, tmp_path)
    snap = table.compact(spark)
    # the compact snapshot itself is a valid time-travel target
    df = table.read(spark, snapshot_id=snap["snapshot_id"])
    assert df.count() == 400
    with open(os.path.join(
            table.manifest_dir,
            f"snapshot-{snap['snapshot_id']:05d}.json")) as fh:
        assert json.load(fh)["op"] == "compact"
