"""Metadata-only aggregates (engine/tables.py stats_agg): COUNT +
column MIN/MAX from the partition manifests alone, zero data files
opened — and, just as important, the EXACTNESS GUARDS: the method must
refuse (never silently mis-answer) when live deletes, a diverged
branch, or missing stats make the metadata unable to prove the
answer."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.engine.tables import (PART_COL, IcebergLike,
                                               with_part_key)


def _wave(spark, lo, hi, buckets=4):
    return with_part_key(
        spark.range(lo, hi)
        .select(F.concat(F.lit("c"), F.col("id").cast("string"))
                .alias("conv_id"),
                F.col("id").cast("long").alias("doc_id"),
                (F.col("id") * 3 % 101).cast("long").alias("v")),
        buckets)


@pytest.fixture()
def tbl():
    return IcebergLike(tempfile.mkdtemp(prefix="statsagg_"))


def test_exact_after_base_and_append(spark, tbl):
    tbl.write(_wave(spark, 0, 100), stat_cols=["doc_id", "v"])
    tbl.write(_wave(spark, 100, 250), stat_cols=["doc_id", "v"],
              append=True)
    agg = tbl.stats_agg(cols=("doc_id", "v"))
    assert agg["rows"] == 250
    assert agg["min"]["doc_id"] == 0 and agg["max"]["doc_id"] == 249
    rows = tbl.read(spark).agg(F.min("v"), F.max("v")).collect()[0]
    assert agg["min"]["v"] == rows[0] and agg["max"]["v"] == rows[1]


def test_rows_only_needs_no_col_stats(spark, tbl):
    tbl.write(_wave(spark, 0, 80))  # no stat_cols at all
    assert tbl.stats_agg()["rows"] == 80


def test_refuses_on_live_deletes_then_materialize(spark, tbl):
    tbl.write(_wave(spark, 0, 100), stat_cols=["doc_id"])
    tbl.delete_rows(spark.createDataFrame([(7,), (9,)],
                                          "doc_id long"), ["doc_id"])
    with pytest.raises(ValueError, match="delete"):
        tbl.stats_agg()
    tbl.materialize_deletes(spark)
    agg = tbl.stats_agg(cols=("doc_id",))
    assert agg["rows"] == 98
    # min/max stay exact: the rewrite recomputed stats from survivors
    assert agg["min"]["doc_id"] == 0 and agg["max"]["doc_id"] == 99


def test_refuses_when_append_invalidated_stats(spark, tbl):
    tbl.write(_wave(spark, 0, 100), stat_cols=["doc_id"])
    tbl.write(_wave(spark, 100, 150), append=True)  # no stat_cols
    assert tbl.stats_agg()["rows"] == 150  # count still provable
    with pytest.raises(ValueError, match="stats"):
        tbl.stats_agg(cols=("doc_id",))  # min/max no longer provable


def test_refuses_while_branch_diverged(spark, tbl):
    tbl.write(_wave(spark, 0, 100), stat_cols=["doc_id"])
    tbl.create_branch("audit")
    w = _wave(spark, 100, 130)
    tbl.write_to_branch(
        "audit", w.withColumn(PART_COL,
                              (F.col(PART_COL) + 4).cast("int")),
        stat_cols=["doc_id"])
    with pytest.raises(ValueError, match="branch"):
        tbl.stats_agg()
    tbl.fast_forward("audit")
    assert tbl.stats_agg(cols=("doc_id",))["rows"] == 130


def test_refuses_without_row_metric(spark, tbl):
    tbl.write(_wave(spark, 0, 50))
    # simulate a legacy manifest that lost its row metric
    k = sorted(tbl.committed_keys())[0]
    m = tbl.manifest(k)
    m["metrics"] = {c: v for c, v in (m.get("metrics") or {}).items()
                    if c != "rows"}
    tbl._write_json_atomic(
        f"{tbl.manifest_dir}/part-{k:05d}.json", m)
    with pytest.raises(ValueError, match="row metric"):
        tbl.stats_agg()
