"""Keyed TTL state (T4): the real stateful-operator form of the
reference's 7-day expiring ownership cache
(fn-notify-progress/main.py:36-40,82-131) — applyInPandasWithState
with event-time TTL semantics + state timeout eviction."""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta, timezone

import pytest

from textract_demo_spark.streaming.state import enrich_with_keyed_ttl_cache

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
DAY = timedelta(days=1)
EVENTS_SCHEMA = "exec_id string, ts timestamp, owner string"


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _write_wave(spark, in_dir, name, rows):
    df = spark.createDataFrame(
        [(e, ts.replace(tzinfo=None), o) for e, ts, o in rows],
        schema=EVENTS_SCHEMA)
    stage = os.path.join(in_dir, f".stage-{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    for i, f in enumerate(sorted(os.listdir(stage))):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f),
                        os.path.join(in_dir, f"wave-{name}-{i}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def _drain(spark, dirs, ttl_seconds):
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .parquet(dirs["in"]))
    enriched = enrich_with_keyed_ttl_cache(stream, ttl_seconds=ttl_seconds)
    q = (enriched.writeStream.format("parquet")
         .option("path", dirs["out"])
         .option("checkpointLocation", dirs["ckpt"])
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    return {(r["exec_id"], str(r["ts"])): (r["owner"],
                                           r["owner_from_cache"])
            for r in spark.read.schema(
                "exec_id string, ts timestamp, owner string,"
                " owner_from_cache boolean").parquet(dirs["out"]).collect()}


def test_keyed_ttl_cache_hit_refresh_expire(spark, dirs):
    ttl = 7 * 24 * 3600  # the reference's 7-day TTL

    # wave A (t0): identities learned; e3 looked up before + after learn
    _write_wave(spark, dirs["in"], "a", [
        ("e1", T0, "alice"),
        ("e2", T0, "bob"),
        ("e3", T0, None),               # cold lookup -> miss
        ("e3", T0 + timedelta(seconds=5), "carol"),
        ("e3", T0 + timedelta(seconds=9), None),  # warm -> hit
    ])
    out = _drain(spark, dirs, ttl)
    assert out[("e1", str(T0.replace(tzinfo=None)))] == ("alice", False)
    assert out[("e3", str(T0.replace(tzinfo=None)))] == (None, False)
    assert out[("e3", str((T0 + timedelta(seconds=9))
                          .replace(tzinfo=None)))] == ("carol", True)

    # wave B (t0+3d, inside TTL): lookups hit; e2 refreshed
    _write_wave(spark, dirs["in"], "b", [
        ("e1", T0 + 3 * DAY, None),
        ("e2", T0 + 3 * DAY, "bob-renewed"),
    ])
    out = _drain(spark, dirs, ttl)
    assert out[("e1", str((T0 + 3 * DAY).replace(tzinfo=None)))] == \
        ("alice", True)

    # wave C (t0+20d): e1 idle 20d > TTL -> expired (cold miss);
    # e2 refreshed at +3d, idle 17d > TTL -> also expired
    _write_wave(spark, dirs["in"], "c", [
        ("e1", T0 + 20 * DAY, None),
        ("e2", T0 + 20 * DAY, None),
    ])
    out = _drain(spark, dirs, ttl)
    assert out[("e1", str((T0 + 20 * DAY).replace(tzinfo=None)))] == \
        (None, False)
    assert out[("e2", str((T0 + 20 * DAY).replace(tzinfo=None)))] == \
        (None, False)


def test_ttl_zero_never_caches_across_gaps(spark, dirs):
    # degenerate TTL: any later lookup is a miss
    _write_wave(spark, dirs["in"], "a", [("e1", T0, "alice")])
    _drain(spark, dirs, ttl_seconds=1)
    _write_wave(spark, dirs["in"], "b", [("e1", T0 + DAY, None)])
    out = _drain(spark, dirs, ttl_seconds=1)
    assert out[("e1", str((T0 + DAY).replace(tzinfo=None)))] == \
        (None, False)


# --- T3: keyed wait-for-review with timeout --------------------------------

TAGGED_SCHEMA = ("conv_id string, turn_idx int, ts timestamp, kind string,"
                 " vendor string, date string, total string,"
                 " worker_id string")


def _write_tagged(spark, in_dir, name, rows):
    df = spark.createDataFrame(
        [(c, t, ts.replace(tzinfo=None), k, v, d, tot, w)
         for c, t, ts, k, v, d, tot, w in rows], schema=TAGGED_SCHEMA)
    stage = os.path.join(in_dir, f".stage-{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    for i, f in enumerate(sorted(os.listdir(stage))):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(stage, f),
                        os.path.join(in_dir, f"wave-{name}-{i}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def _drain_wait(spark, dirs, timeout_seconds=3600):
    from textract_demo_spark.streaming.state import (WAIT_OUTPUT_SCHEMA,
                                                     review_wait_with_timeout)
    stream = spark.readStream.schema(TAGGED_SCHEMA).parquet(dirs["in"])
    out = review_wait_with_timeout(stream, timeout_seconds=timeout_seconds)
    q = (out.writeStream.format("parquet")
         .option("path", dirs["out"])
         .option("checkpointLocation", dirs["ckpt"])
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    return {(r["conv_id"], r["turn_idx"]): r.asDict()
            for r in spark.read.schema(WAIT_OUTPUT_SCHEMA)
            .parquet(dirs["out"]).collect()}


def test_review_wait_match_timeout_and_out_of_order(spark, dirs):
    R = lambda c, ts: (c, 0, ts, "result", None, None, None, None)  # noqa
    V = lambda c, ts, w: (c, 0, ts, "review", "Vendor Co",  # noqa
                          "2020-07-07", "64.30", w)
    # wave A: three turns enter the wait; c3's review arrives BEFORE
    # its result (out-of-order token round-trip)
    _write_tagged(spark, dirs["in"], "a", [
        R("c1", T0), R("c2", T0), V("c3", T0, "w-3")])
    out = _drain_wait(spark, dirs)
    assert out == {}  # everything still parked

    # wave B (t0+10min, inside the 3600s timeout): c1's review lands;
    # c3's result lands and matches the held review
    _write_tagged(spark, dirs["in"], "b", [
        V("c1", T0 + timedelta(seconds=600), "w-1"),
        R("c3", T0 + timedelta(seconds=600))])
    out = _drain_wait(spark, dirs)
    assert out[("c1", 0)]["reviewed"] is True
    assert out[("c1", 0)]["worker_id"] == "w-1"
    assert out[("c1", 0)]["vendor"] == "Vendor Co"
    assert out[("c3", 0)]["reviewed"] is True
    assert out[("c3", 0)]["worker_id"] == "w-3"
    assert ("c2", 0) not in out  # still parked

    # wave C (t0+2h): watermark passes c2's deadline => timed out,
    # stays unreviewed (the 3600s waitForTaskToken expiry)
    _write_tagged(spark, dirs["in"], "c", [
        R("c9", T0 + 2 * timedelta(hours=1))])
    out = _drain_wait(spark, dirs)
    assert out[("c2", 0)]["reviewed"] is False
    assert out[("c2", 0)]["timed_out"] is True


def test_review_past_event_time_deadline_never_matches(spark, dirs):
    """A review whose EVENT TIME is past result_ts + timeout is
    expired even if it arrives before the state timeout fires: the
    turn surfaces as timed_out, not reviewed (waitForTaskToken's
    3600s deadline is an event-time fact, not an arrival-order one)."""
    _write_tagged(spark, dirs["in"], "a", [
        ("c1", 0, T0, "result", None, None, None, None)])
    out = _drain_wait(spark, dirs)
    assert out == {}
    # the review lands in the next batch with ts 2h after the result —
    # past the 3600s deadline; its arrival also advances the watermark
    # past the deadline, firing the timeout in the same drain
    _write_tagged(spark, dirs["in"], "b", [
        ("c1", 0, T0 + 2 * timedelta(hours=1), "review",
         "Vendor Co", "2020-07-07", "64.30", "w-late")])
    out = _drain_wait(spark, dirs)
    assert out[("c1", 0)]["reviewed"] is False
    assert out[("c1", 0)]["timed_out"] is True
    assert out[("c1", 0)]["worker_id"] is None


def test_review_late_in_same_batch_does_not_match(spark, dirs):
    """Result + past-deadline review in ONE batch: output must not
    depend on them sharing a micro-batch — still timed_out."""
    _write_tagged(spark, dirs["in"], "a", [
        ("c1", 0, T0, "result", None, None, None, None),
        ("c1", 0, T0 + 2 * timedelta(hours=1), "review",
         "Vendor Co", "2020-07-07", "64.30", "w-late"),
        # sentinel advances the watermark past c1's deadline
        ("c9", 0, T0 + 3 * timedelta(hours=1), "result",
         None, None, None, None)])
    out = _drain_wait(spark, dirs)
    assert out[("c1", 0)]["reviewed"] is False
    assert out[("c1", 0)]["timed_out"] is True


def test_duplicate_result_does_not_extend_deadline(spark, dirs):
    """A replayed result must keep the FIRST result's event time as
    the park anchor: a review within timeout of the replay but past
    timeout of the original does not match."""
    _write_tagged(spark, dirs["in"], "a", [
        ("c1", 0, T0, "result", None, None, None, None),
        ("c1", 0, T0 + timedelta(seconds=3000), "result",
         None, None, None, None)])
    _write_tagged(spark, dirs["in"], "b", [
        # ts is 1200s after the replay but 4200s after the original
        ("c1", 0, T0 + timedelta(seconds=4200), "review",
         "Vendor Co", "2020-07-07", "64.30", "w-dup")])
    out = _drain_wait(spark, dirs)
    assert out[("c1", 0)]["reviewed"] is False
    assert out[("c1", 0)]["timed_out"] is True


def _drain_wait_per_file(spark, dirs, timeout_seconds=3600):
    """One drain, ONE FILE PER MICRO-BATCH: earlier files advance the
    watermark before later files' data is processed — the arrival
    shape that exercises the batch-start-watermark guards."""
    from textract_demo_spark.streaming.state import (WAIT_OUTPUT_SCHEMA,
                                                     review_wait_with_timeout)
    stream = (spark.readStream.schema(TAGGED_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(dirs["in"]))
    out = review_wait_with_timeout(stream, timeout_seconds=timeout_seconds)
    q = (out.writeStream.format("parquet")
         .option("path", dirs["out"])
         .option("checkpointLocation", dirs["ckpt"])
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    return {(r["conv_id"], r["turn_idx"]): r.asDict()
            for r in spark.read.schema(WAIT_OUTPUT_SCHEMA)
            .parquet(dirs["out"]).collect()}


def test_data_arriving_past_deadline_watermark_resolves_inline(
        spark, dirs):
    """ADVICE r03 hazard: a group receives data in a micro-batch whose
    START watermark already passed result_ts + timeout. Re-parking
    would call setTimeoutTimestamp behind the watermark —
    IllegalArgumentException, query dead. The operator must resolve
    the expiry inline (timed_out row) and the drain must finish.

    Shape: drain 1 parks c1 (deadline T0+1h). Drain 2 feeds one file
    per batch: first a sentinel that moves the watermark to T0+2h,
    then an in-watermark review for c1 at T0+2.5h (past the event-time
    deadline). c1's data is processed with batch-start watermark
    T0+2h > deadline."""
    _write_tagged(spark, dirs["in"], "a", [
        ("c1", 0, T0, "result", None, None, None, None)])
    out = _drain_wait_per_file(spark, dirs)
    assert out == {}  # parked
    # files sort by name => 'b1' (sentinel) batches before 'b2'
    _write_tagged(spark, dirs["in"], "b1", [
        ("c9", 0, T0 + timedelta(hours=2), "result",
         None, None, None, None)])
    _write_tagged(spark, dirs["in"], "b2", [
        ("c1", 0, T0 + timedelta(minutes=150), "review",
         "Vendor Co", "2020-07-07", "64.30", "w-late")])
    out = _drain_wait_per_file(spark, dirs)
    assert out[("c1", 0)]["reviewed"] is False
    assert out[("c1", 0)]["timed_out"] is True
    assert out[("c1", 0)]["worker_id"] is None


def test_held_review_past_ttl_watermark_dropped_inline(spark, dirs):
    """Same hazard for the review-before-result hold: a held review
    whose TTL deadline is behind the batch-start watermark when more
    data arrives must be dropped inline (no emit — the unknown-token
    drop), not re-parked behind the watermark."""
    _write_tagged(spark, dirs["in"], "a", [
        ("c1", 0, T0, "review", "Vendor Co", "2020-07-07", "64.30",
         "w-early")])
    out = _drain_wait_per_file(spark, dirs)
    assert out == {}  # held
    _write_tagged(spark, dirs["in"], "b1", [
        ("c9", 0, T0 + timedelta(hours=2), "result",
         None, None, None, None)])
    _write_tagged(spark, dirs["in"], "b2", [
        # a SECOND review for c1, in-watermark: the group gets data
        # while the held review's deadline (T0+1h) is behind the
        # T0+2h batch-start watermark; first-review-wins keeps the
        # held (now expired) answers => drop, no emit
        ("c1", 0, T0 + timedelta(minutes=150), "review",
         "Vendor Co", "2020-07-07", "64.30", "w-later")])
    out = _drain_wait_per_file(spark, dirs)
    assert ("c1", 0) not in out  # dropped silently, drain survived


def test_ttl_boundary_lookup_is_a_hit(spark, dirs):
    """Per-row TTL boundary: a lookup at EXACTLY last_refresh + ttl is
    still a hit (expiry is strict '>'), and re-parking at a deadline
    ahead of the batch-start watermark is legal. The read-only batch
    restores state, answers, and re-parks at the same deadline."""
    ttl = 3 * 24 * 3600
    _write_wave(spark, dirs["in"], "a", [("e1", T0, "alice")])
    _drain(spark, dirs, ttl_seconds=ttl)
    # batch-start watermark is T0 here — the boundary row is on time
    _write_wave(spark, dirs["in"], "c", [("e1", T0 + 3 * DAY, None)])
    out = _drain(spark, dirs, ttl_seconds=ttl)
    key = ("e1", str((T0 + 3 * DAY).replace(tzinfo=None)))
    assert out[key] == ("alice", True)
    # one second past the boundary: expired per-row => miss
    _write_wave(spark, dirs["in"], "d", [
        ("e1", T0 + 3 * DAY + timedelta(seconds=1), None)])
    out = _drain(spark, dirs, ttl_seconds=ttl)
    key = ("e1", str((T0 + 3 * DAY + timedelta(seconds=1))
                     .replace(tzinfo=None)))
    assert out[key] == (None, False)


def test_ttl_cache_deadline_at_watermark_survives(spark, dirs):
    """ADVICE r03 hazard, TTL-cache side: once the watermark reaches
    last_refresh + ttl, nothing may re-park the entry AT/behind the
    watermark (EventTimeTimeout would throw, killing the query). A
    lookup with ts == watermark is late data — Spark drops it before
    the operator (no output row); the drains must all survive and the
    entry must end up evicted, so a later lookup misses."""
    ttl = 3 * 24 * 3600
    _write_wave(spark, dirs["in"], "a", [("e1", T0, "alice")])
    _drain(spark, dirs, ttl_seconds=ttl)
    # sentinel advances the watermark to exactly e1's deadline
    _write_wave(spark, dirs["in"], "b", [("e9", T0 + 3 * DAY, "bob")])
    _drain(spark, dirs, ttl_seconds=ttl)
    # read-only lookup at ts == watermark == deadline: late-dropped
    _write_wave(spark, dirs["in"], "c", [("e1", T0 + 3 * DAY, None)])
    out = _drain(spark, dirs, ttl_seconds=ttl)
    assert ("e1", str((T0 + 3 * DAY).replace(tzinfo=None))) not in out
    # the query survived and the entry is gone: later lookup misses
    _write_wave(spark, dirs["in"], "d", [("e1", T0 + 3 * DAY + DAY,
                                          None)])
    out = _drain(spark, dirs, ttl_seconds=ttl)
    key = ("e1", str((T0 + 4 * DAY).replace(tzinfo=None)))
    assert out[key] == (None, False)
