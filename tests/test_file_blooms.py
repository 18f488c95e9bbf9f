"""Bloom-filter file skipping: ``write(bloom_cols=)`` records a
per-file bloom over each column's distinct values (the Iceberg
puffin-blob analog) and ``read_where`` point predicates (lo == hi)
drop files whose bloom definitely excludes the value. The property
that matters: blooms answer the probe range stats CANNOT — files
whose [min, max] straddles the value because keys interleave across
write waves. Like all pruning here, it is an optimization, never a
filter: a false positive or a missing bloom keeps the file and the
residual predicate decides; false negatives are impossible (asserted
exhaustively below)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.engine.tables import (PART_COL, IcebergLike,
                                               _bloom_maybe_contains,
                                               with_part_key)


def _docs(spark, lo, hi, step=1, parts=1):
    df = (spark.range(lo, hi, step)
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


def test_bloom_no_false_negatives_and_sane_fpp(spark, tmp_path):
    """Every written value must probe positive (a false negative
    would wrongly drop matching rows — the one unforgivable failure);
    absent values probe positive rarely (~1% design point, asserted
    loosely at <10%)."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), bloom_cols=["doc_id"])
    m = t.manifest(0)
    fb = m["file_blooms"]
    assert set(fb) == set(m["files"])
    ents = [b["doc_id"] for b in fb.values()]
    # every written value is positive in at least one file's bloom
    # (exactly the file that holds it — membership across files is
    # unknowable here, union is the sound assertion)
    assert all(any(_bloom_maybe_contains(e, v) for e in ents)
               for v in range(0, 400, 2))
    fp = sum(any(_bloom_maybe_contains(e, v) for e in ents)
             for v in range(1, 4000, 2))
    # union fpp over however many files the write produced; each is
    # sized for ~1%, so even a handful stays well under this bound
    assert fp / 2000 < 0.05 * max(2, len(ents))


def test_point_lookup_prunes_interleaved_files(spark, tmp_path):
    """The headline case: an even-id wave and an odd-id wave share
    one partition and span the same doc_id range, so every file's
    footer bounds straddle every probe — range skipping keeps
    everything, the bloom drops the opposite-parity file."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), stat_cols=["doc_id"],
            bloom_cols=["doc_id"])
    t.write(_docs(spark, 1, 400, step=2), stat_cols=["doc_id"],
            bloom_cols=["doc_id"], append=True)
    out, rep = t.read_where(spark, "doc_id", lo=201, hi=201)
    assert _ids(out) == [201]
    assert rep["files_pruned_bloom"] >= 1
    assert rep["files_pruned"] == rep["files_pruned_bloom"]
    m = t.manifest(0)
    even_files = {f for f in m["files"] if not f.startswith("s")}
    assert _files_read(out).isdisjoint(even_files)


def test_range_predicates_never_probe_blooms(spark, tmp_path):
    """lo != hi is not a membership question — the bloom must stay
    out of the way and the result must be exact."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), bloom_cols=["doc_id"])
    out, rep = t.read_where(spark, "doc_id", lo=100, hi=200)
    assert _ids(out) == list(range(100, 201, 2))
    assert rep["files_pruned_bloom"] == 0


def test_append_without_bloom_cols_inherits_tracked_columns(
        spark, tmp_path):
    """upsert/CDC call write(append=True) with no bloom_cols; the
    appended files must still get blooms for the columns the base
    tracked, or an append-heavy table silently loses point skipping
    — proven by probing an EVEN id and seeing the appended odd-wave
    file bloom-pruned."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), bloom_cols=["doc_id"])
    t.write(_docs(spark, 1, 400, step=2), append=True)
    m = t.manifest(0)
    assert set(m["file_blooms"]) == set(m["files"])
    out, rep = t.read_where(spark, "doc_id", lo=200, hi=200)
    assert _ids(out) == [200]
    assert rep["files_pruned_bloom"] >= 1
    # the t.files metadata view surfaces which columns carry blooms
    assert all(r.bloom_cols == "doc_id"
               for r in t.meta_files(spark).collect())


def test_string_column_blooms(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), bloom_cols=["conv_id"])
    t.write(_docs(spark, 1, 400, step=2), append=True)
    out, rep = t.read_where(spark, "conv_id", lo="c51", hi="c51")
    assert [r.conv_id for r in out.collect()] == ["c51"]
    assert rep["files_pruned_bloom"] >= 1


def test_integral_float_probe_folds_to_int(spark, tmp_path):
    """Parquet int columns surface Python ints at build time; a probe
    of 50.0 must still hit the file holding 50 (fold, don't hash the
    float's string form) and may prune the wave without it."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), bloom_cols=["doc_id"])
    t.write(_docs(spark, 1, 400, step=2), append=True)
    out, rep = t.read_where(spark, "doc_id", lo=50.0, hi=50.0)
    assert _ids(out) == [50]
    assert rep["files_pruned_bloom"] >= 1
    # non-integral float: bloom abstains, residual filter decides
    out2, rep2 = t.read_where(spark, "doc_id", lo=50.5, hi=50.5)
    assert out2.count() == 0
    assert rep2["files_pruned_bloom"] == 0


def test_missing_bloom_is_conservative(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2))  # no bloom_cols at all
    out, rep = t.read_where(spark, "doc_id", lo=200, hi=200)
    assert _ids(out) == [200]
    assert rep["files_pruned_bloom"] == 0


def test_compaction_refreshes_blooms(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2, parts=4),
            bloom_cols=["doc_id"], rebalance=False)
    old = set(t.manifest(0)["file_blooms"])
    t.compact(spark, min_files=2)
    m = t.manifest(0)
    fb = m.get("file_blooms") or {}
    assert set(fb) == set(m["files"]) and set(fb).isdisjoint(old)
    out, rep = t.read_where(spark, "doc_id", lo=200, hi=200)
    assert _ids(out) == [200]


def test_rollback_and_crash_strip_drop_bloom_entries(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_docs(spark, 0, 400, step=2), bloom_cols=["doc_id"])
    target = t.snapshots()[-1]["snapshot_id"]
    t.write(_docs(spark, 1, 400, step=2), bloom_cols=["doc_id"],
            append=True)
    t.rollback(spark, target)
    m = t.manifest(0)
    assert set(m.get("file_blooms") or {}) == set(m["files"])

    def bucketed(lo, hi):
        return with_part_key(
            spark.range(lo, hi)
            .select(F.concat(F.lit("c"), F.col("id").cast("string"))
                    .alias("conv_id"),
                    F.col("id").cast("long").alias("doc_id")), 4)

    t2 = IcebergLike(str(tmp_path / "t2"))
    t2.write(bucketed(0, 100), bloom_cols=["doc_id"])
    with pytest.raises(RuntimeError, match="injected failure"):
        t2.write(bucketed(1000, 1100), bloom_cols=["doc_id"],
                 append=True, run_id="crash-run", fail_after=1)
    t2.write(bucketed(1000, 1100), bloom_cols=["doc_id"],
             append=True, run_id="crash-run")
    for k in t2.committed_keys():
        m2 = t2.manifest(k)
        assert set(m2.get("file_blooms") or {}) <= set(m2["files"])
    assert _ids(t2.read(spark)) == (list(range(100))
                                    + list(range(1000, 1100)))
