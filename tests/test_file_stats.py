"""File-level skipping: per-file footer min/max recorded in the
manifests at commit time (Iceberg data-file stats analog) and honored
by ``read_where`` WITHIN kept partitions. The property that matters:
file stats are attached to immutable objects, so they stay exact in
mixed-age partitions where appends forced the partition-level range
open — the partition entry widens (or drops, when one side carried no
stats), the per-file entries don't."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.engine.tables import (PART_COL, IcebergLike,
                                               _footer_stats,
                                               with_part_key)


def _docs(spark, lo, hi, parts=1):
    df = (spark.range(lo, hi)
          .select(F.concat(F.lit("c"), F.col("id").cast("string"))
                  .alias("conv_id"),
                  F.col("id").cast("long").alias("doc_id"),
                  (F.col("id") % 7).cast("long").alias("v")))
    if parts > 1:
        df = df.repartition(parts)
    return df.withColumn(PART_COL, F.lit(0))


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def _files_read(df):
    return {os.path.basename(f) for f in df.inputFiles()}


def test_file_stats_recorded_at_write(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100, parts=4), stat_cols=["doc_id"],
            rebalance=False)
    m = t.manifest(0)
    fs = m["file_stats"]
    assert set(fs) == set(m["files"]) and len(fs) >= 2
    # per-file bounds cover the partition range exactly
    assert min(s["doc_id"]["min"] for s in fs.values()) == 0
    assert max(s["doc_id"]["max"] for s in fs.values()) == 99
    # and agree with the footers they came from
    d = os.path.join(t.data_dir, f"{PART_COL}=0")
    for f, s in fs.items():
        assert _footer_stats(os.path.join(d, f), ["doc_id"]) == s
    # the t.files metadata view surfaces the bounds
    import json
    meta = {r.file: r.file_stats_json
            for r in t.meta_files(spark).collect()}
    assert all(json.loads(meta[f]) == fs[f] for f in fs)


def test_file_skipping_inside_mixed_age_partition(spark, tmp_path):
    """The headline case: base [0,100) + appended wave [1000,1100)
    land in ONE partition. Partition-level stats widen to [0,1099] so
    partition pruning keeps it; per-file stats still skip every base
    file for a high-range scan (and every append file for a low one).
    """
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100, parts=3), stat_cols=["doc_id"],
            rebalance=False)
    t.write(_docs(spark, 1000, 1100, parts=3), stat_cols=["doc_id"],
            append=True, rebalance=False)
    m = t.manifest(0)
    assert m["col_stats"]["doc_id"] == {"min": 0, "max": 1099}
    out, rep = t.read_where(spark, "doc_id", lo=1000, hi=None)
    assert _ids(out) == list(range(1000, 1100))
    assert rep["partitions_pruned"] == []  # partition range overlaps
    assert rep["files_pruned"] >= 3        # but the base files don't
    base_files = {f for f in m["files"] if not f.startswith("s")}
    assert _files_read(out).isdisjoint(base_files)
    out2, rep2 = t.read_where(spark, "doc_id", lo=None, hi=99)
    assert _ids(out2) == list(range(100))
    assert rep2["files_pruned"] >= 3
    assert all(not f.startswith("s") for f in _files_read(out2))


def test_append_without_stat_cols_inherits_tracked_columns(
        spark, tmp_path):
    """upsert/CDC call write(append=True) with stat_cols=None; the
    appended files must still get footer stats for the columns the
    base tracked, or an append-heavy table silently loses skipping."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100), stat_cols=["doc_id"])
    t.write(_docs(spark, 1000, 1100), append=True)  # no stat_cols
    m = t.manifest(0)
    # partition-level entry dropped (one-sided merge — documented),
    # per-file entries present for EVERY file including the appends
    assert "doc_id" not in (m.get("col_stats") or {})
    assert set(m["file_stats"]) == set(m["files"])
    out, rep = t.read_where(spark, "doc_id", lo=1000, hi=None)
    assert _ids(out) == list(range(1000, 1100))
    assert rep["files_pruned"] >= 1


def test_all_files_pruned_returns_empty_with_schema(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100), stat_cols=["doc_id"])
    out, rep = t.read_where(spark, "doc_id", lo=5000, hi=None)
    assert out.count() == 0
    assert set(out.columns) >= {"conv_id", "doc_id", "v"}


def test_missing_file_stats_is_conservative(spark, tmp_path):
    """A manifest with no file_stats (or a file absent from it) reads
    the whole partition dir — pruning is an optimization, never a
    filter."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100))  # no stat_cols at all
    out, rep = t.read_where(spark, "doc_id", lo=50, hi=None)
    assert _ids(out) == list(range(50, 100))
    assert rep["files_pruned"] == 0


def test_file_skipping_composes_with_deletes_and_time_travel(
        spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100, parts=2), stat_cols=["doc_id"],
            rebalance=False)
    snap_base = t.snapshots()[-1]["snapshot_id"]
    t.write(_docs(spark, 1000, 1100, parts=2), stat_cols=["doc_id"],
            append=True, rebalance=False)
    t.delete_rows(spark.createDataFrame([(1005,)], "doc_id long"),
                  ["doc_id"])
    out, rep = t.read_where(spark, "doc_id", lo=1000, hi=None)
    assert rep["files_pruned"] >= 2
    assert 1005 not in _ids(out)
    assert _ids(out) == [i for i in range(1000, 1100) if i != 1005]
    # time travel to the base snapshot: the appends are file-pruned
    # AND sequence-filtered; the later delete does not apply
    out2, _ = t.read_where(spark, preds={"doc_id": (None, 99)},
                           snapshot_id=snap_base)
    assert _ids(out2) == list(range(100))


def test_compaction_refreshes_file_stats(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100, parts=4), stat_cols=["doc_id"],
            rebalance=False)
    old = set(t.manifest(0)["file_stats"])
    t.compact(spark, min_files=2)
    m = t.manifest(0)
    fs = m.get("file_stats") or {}
    # entries name the NEW files only, with correct recomputed bounds
    assert set(fs) == set(m["files"]) and set(fs).isdisjoint(old)
    assert min(s["doc_id"]["min"] for s in fs.values()) == 0
    assert max(s["doc_id"]["max"] for s in fs.values()) == 99
    out, _ = t.read_where(spark, "doc_id", lo=0, hi=99)
    assert _ids(out) == list(range(100))


def test_rollback_strips_file_stats_of_stripped_files(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 100), stat_cols=["doc_id"])
    target = t.snapshots()[-1]["snapshot_id"]
    t.write(_docs(spark, 1000, 1100), stat_cols=["doc_id"],
            append=True)
    t.rollback(spark, target)
    m = t.manifest(0)
    assert set(m.get("file_stats") or {}) == set(m["files"])
    assert all(s["doc_id"]["max"] <= 99
               for s in m["file_stats"].values())


def test_crashed_append_strip_removes_file_stats(spark, tmp_path):
    def bucketed(lo, hi):
        return with_part_key(
            spark.range(lo, hi)
            .select(F.concat(F.lit("c"), F.col("id").cast("string"))
                    .alias("conv_id"),
                    F.col("id").cast("long").alias("doc_id"),
                    (F.col("id") % 7).cast("long").alias("v")), 4)

    t = IcebergLike(str(tmp_path / "t"))
    t.write(bucketed(0, 100), stat_cols=["doc_id"])
    with pytest.raises(RuntimeError, match="injected failure"):
        # crash AFTER one partition's append manifested, BEFORE the
        # snapshot publish — the exactly-once window
        t.write(bucketed(1000, 1100), stat_cols=["doc_id"],
                append=True, run_id="crash-run", fail_after=1)
    # rerun the same run_id: the crashed attempt's manifested appends
    # are stripped first — file_stats must not keep naming them
    t.write(bucketed(1000, 1100), stat_cols=["doc_id"],
            append=True, run_id="crash-run")
    for k in t.committed_keys():
        m = t.manifest(k)
        assert set(m.get("file_stats") or {}) <= set(m["files"])
    assert _ids(t.read(spark)) == (list(range(100))
                                   + list(range(1000, 1100)))
