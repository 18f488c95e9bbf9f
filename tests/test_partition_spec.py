"""Hidden partitioning: partition-spec transforms, key arithmetic,
and spec-only (no-stats) pruning in read_where.

The load-bearing invariants:
- the Python-side digit math used by the pruner agrees with the JVM
  expressions used by the writer for every value (else pruning would
  silently drop live partitions — the one failure mode pruning must
  never have);
- pruned partitions provably contain no matching rows (exhaustive
  complement check);
- key assignment is a pure narrow projection (no Exchange).
"""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from textract_demo_spark.engine.partition_spec import (
    PART_COL, PartitionField, _py_ordered_digit, key_pruner,
    parse_spec, spec_from_json, spec_part_key, spec_to_json)
from textract_demo_spark.engine.tables import IcebergLike


def _events(spark, n=600, users=13):
    return (spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(hours=(F.col("id") % 720))).alias("ts"),
        (F.col("id") % users).cast("long").alias("user_id"),
        (F.col("id") % 3).cast("double").alias("value")))


# ---- transform digit agreement (Python pruner vs JVM writer) --------

@pytest.mark.parametrize("transform,col,n", [
    ("days", "ts", None), ("hours", "ts", None), ("months", "ts", None),
    ("truncate", "user_id", 5),
])
def test_python_digit_matches_jvm(spark, transform, col, n):
    f = PartitionField(transform, col, n)
    df, _ = spec_part_key(_events(spark), [f])
    rows = df.select(col, PART_COL).distinct().collect()
    assert rows
    for r in rows:
        assert _py_ordered_digit(f, r[col]) == r[PART_COL], \
            f"{transform}({r[col]!r})"


def test_python_digit_accepts_strings_and_dates():
    f = PartitionField("days", "ts")
    assert _py_ordered_digit(f, "2024-01-10") == \
        _py_ordered_digit(f, datetime(2024, 1, 10, 5, 0)) == \
        _py_ordered_digit(f, date(2024, 1, 10)) == 19732


def test_mixed_radix_key_roundtrip(spark):
    df, spec = spec_part_key(
        _events(spark), [("days", "ts"), ("bucket", "user_id", 4),
                         ("bucket", "event_id", 3)])
    rows = df.select("ts", "user_id", "event_id", PART_COL).collect()
    dayf = spec[0]
    for r in rows:
        assert r[PART_COL] // 12 == _py_ordered_digit(dayf, r.ts)
    # same (day, user, event) always gets the same key
    assert df.select("ts", "user_id", "event_id",
                     PART_COL).distinct().count() == \
        df.select("ts", "user_id", "event_id").distinct().count()


def test_spec_validation():
    with pytest.raises(ValueError):
        parse_spec([])
    with pytest.raises(ValueError):
        parse_spec([("days", "ts"), ("hours", "ts")])
    with pytest.raises(ValueError):
        parse_spec([("bucket", "user_id")])  # missing n
    with pytest.raises(ValueError):
        parse_spec([("zorder", "x")])
    spec = parse_spec([("bucket", "u", 4), ("days", "ts")])
    assert [f.transform for f in spec] == ["days", "bucket"]
    assert spec_from_json(spec_to_json(spec)) == spec


def test_key_assignment_is_narrow(spark):
    """Zero shuffle: the spec key is a projection over the scan —
    no Exchange may appear in the plan."""
    df, _ = spec_part_key(
        _events(spark), [("days", "ts"), ("bucket", "user_id", 4)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---- table-level behavior -------------------------------------------

def test_spec_pruning_no_stats(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_events(spark),
            partition_spec=[("days", "ts"), ("bucket", "user_id", 4)])
    assert t.partition_spec() is not None
    lo, hi = datetime(2024, 1, 10), datetime(2024, 1, 14, 23, 59, 59)
    out, rep = t.read_where(spark, "ts", lo=lo, hi=hi)
    assert rep["pruned_by_spec"] and not rep["pruned_by_stats"]
    # exhaustive complement: every pruned partition holds no match
    full = t.read(spark)
    in_pruned = full.withColumn(
        "_k", F.pmod(F.xxhash64("user_id"), F.lit(4)).cast("long")
        + F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long") * 4).filter(
        F.col("_k").isin(rep["pruned_by_spec"])
        & (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
    assert in_pruned.count() == 0
    # and the kept view equals a plain filter over the full table
    want = full.filter((F.col("ts") >= F.lit(lo))
                       & (F.col("ts") <= F.lit(hi))).count()
    assert out.count() == want


def test_bucket_point_lookup_prunes(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_events(spark),
            partition_spec=[("days", "ts"), ("bucket", "user_id", 4)])
    out, rep = t.read_where(spark, "user_id", lo=7, hi=7)
    assert rep["pruned_by_spec"]
    assert out.count() == t.read(spark).filter("user_id = 7").count()
    # a RANGE predicate on a bucket column must not prune (hash
    # destroys order) — conservative keep
    _, rep2 = t.read_where(spark, "user_id", lo=3, hi=9)
    assert not rep2["pruned_by_spec"]


def test_point_lookup_scans_only_matching_files(spark, tmp_path):
    """Evidence at the file level: the pruned scan lists only
    partition dirs whose bucket digit matches."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_events(spark),
            partition_spec=[("days", "ts"), ("bucket", "user_id", 4)])
    out, rep = t.read_where(
        spark, preds={"ts": (datetime(2024, 1, 3),
                             datetime(2024, 1, 5, 23, 59, 59)),
                      "user_id": (7, 7)})
    files = out.inputFiles()
    assert files
    keys = {int(p.split(f"{PART_COL}=")[1].split("/")[0])
            for p in files}
    assert keys == set(rep["partitions_kept"])
    assert len(keys) <= 3  # 3 days x 1 bucket


def test_spec_is_pinned(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    ev = _events(spark)
    t.write(ev, partition_spec=[("days", "ts")])
    with pytest.raises(ValueError, match="spec mismatch"):
        t.write(ev, partition_spec=[("hours", "ts")], append=True)
    # identical spec re-binds fine (append wave)
    t.write(ev, partition_spec=[("days", "ts")], append=True)
    assert t.read(spark).count() == 2 * ev.count()


def test_pred_on_nonspec_column_keeps_all(spark, tmp_path):
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_events(spark), partition_spec=[("days", "ts")])
    _, rep = t.read_where(spark, "value", lo=1.0, hi=2.0)
    assert not rep["pruned_by_spec"]


def test_spec_pruning_composes_with_stats(spark, tmp_path):
    """Stats pruning still runs on the spec survivors: event_id is
    monotone with ts here, so its per-partition min/max prunes a
    sub-range the spec alone cannot."""
    t = IcebergLike(str(tmp_path / "t"))
    t.write(_events(spark),
            partition_spec=[("days", "ts")], stat_cols=["event_id"])
    _, rep = t.read_where(
        spark, preds={"ts": (datetime(2024, 1, 3), None),
                      "event_id": (None, 100)})
    assert rep["pruned_by_spec"] and rep["pruned_by_stats"]
