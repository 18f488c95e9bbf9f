"""Temporal operators: as-of join semantics vs pandas merge_asof
(the independent reference implementation), sessionization boundary
algebra, and determinism under ties."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from textract_demo_spark.datapipe.temporal import (asof_join,
                                                   session_stats,
                                                   sessionize)


def _mk_events(spark, rows, schema="user_id BIGINT, ts TIMESTAMP,"
                                   " event_id BIGINT"):
    return spark.createDataFrame(rows, schema)


def TS(s: str):
    from datetime import datetime
    return datetime.fromisoformat(s)


def _asof_case(spark, allow_exact):
    left = _mk_events(spark, [
        (1, TS("2024-01-01 10:00:00"), 100),
        (1, TS("2024-01-01 12:00:00"), 101),
        (1, TS("2024-01-01 09:00:00"), 102),   # before any right row
        (2, TS("2024-01-01 10:30:00"), 200),
        (3, TS("2024-01-01 10:00:00"), 300),   # key with no right rows
    ])
    right = _mk_events(spark, [
        (1, TS("2024-01-01 09:30:00"), 10),
        (1, TS("2024-01-01 10:00:00"), 11),    # ties left id=100 on ts
        (1, TS("2024-01-01 11:00:00"), 12),
        (2, TS("2024-01-01 10:30:00"), 20),    # exact-ts-only match
    ])
    out = asof_join(left, right, on="user_id", ts="ts",
                    right_cols=["event_id"], tiebreak="event_id",
                    allow_exact_matches=allow_exact)
    return {r["event_id"]: r["asof_event_id"]
            for r in out.collect()}


def test_asof_strictly_before(spark):
    got = _asof_case(spark, allow_exact=False)
    assert got == {100: 10,   # 10:00 row must NOT see the 10:00 click
                   101: 12, 102: None, 200: None, 300: None}


def test_asof_allow_exact(spark):
    got = _asof_case(spark, allow_exact=True)
    assert got == {100: 11, 101: 12, 102: None, 200: 20, 300: None}


def test_asof_equal_ts_tiebreak_largest_wins(spark):
    left = _mk_events(spark, [(1, TS("2024-01-01 12:00:00"), 100)])
    right = _mk_events(spark, [
        (1, TS("2024-01-01 10:00:00"), 7),
        (1, TS("2024-01-01 10:00:00"), 9),
        (1, TS("2024-01-01 10:00:00"), 8),
    ])
    out = asof_join(left, right, on="user_id", ts="ts",
                    right_cols=["event_id"], tiebreak="event_id")
    assert out.collect()[0]["asof_event_id"] == 9


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof (independent
    algorithm: sort-merge scan vs our union-tag window)."""
    import numpy as np
    rng = np.random.RandomState(7)
    n_l, n_r = 400, 300
    lp = pd.DataFrame({
        "user_id": rng.randint(0, 12, n_l),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n_l) * 10**6),
        "lid": np.arange(n_l),
    })
    rp = pd.DataFrame({
        "user_id": rng.randint(0, 12, n_r),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n_r) * 10**6),
        "event_id": np.arange(n_r),
    })
    # merge_asof needs unique (key, ts) on the right to be
    # deterministic; drop dup ts per key keeping max event_id (our
    # tiebreak semantics)
    rp = (rp.sort_values(["user_id", "ts", "event_id"])
          .groupby(["user_id", "ts"], as_index=False).last())
    exp = pd.merge_asof(
        lp.sort_values("ts"), rp.sort_values("ts"),
        on="ts", by="user_id", allow_exact_matches=True,
        direction="backward")
    exp_map = dict(zip(exp["lid"], exp["event_id"]))
    out = asof_join(
        spark.createDataFrame(lp, "user_id BIGINT, ts TIMESTAMP,"
                                  " lid BIGINT"),
        spark.createDataFrame(rp, "user_id BIGINT, ts TIMESTAMP,"
                                  " event_id BIGINT"),
        on="user_id", ts="ts", right_cols=["event_id"],
        tiebreak="event_id", allow_exact_matches=True)
    got = {r["lid"]: r["asof_event_id"] for r in out.collect()}
    for lid, e in exp_map.items():
        g = got[lid]
        if pd.isna(e):
            assert g is None, (lid, g, e)
        else:
            assert g == int(e), (lid, g, e)


def test_sessionize_boundaries(spark):
    gap = 30 * 60 * 1_000_000
    ev = _mk_events(spark, [
        (1, TS("2024-01-01 10:00:00"), 1),
        (1, TS("2024-01-01 10:29:59"), 2),   # within gap
        (1, TS("2024-01-01 11:00:00"), 3),   # 30:01 -> new session
        (1, TS("2024-01-01 11:30:00"), 4),   # exactly 30:00 -> SAME
        (2, TS("2024-01-01 10:00:00"), 5),
    ])
    s = sessionize(ev, key="user_id", ts="ts", gap_us=gap,
                   order_tiebreak="event_id")
    got = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_session_stats_aggregates(spark):
    ev = _mk_events(spark, [
        (1, TS("2024-01-01 10:00:00"), 1),
        (1, TS("2024-01-01 10:10:00"), 2),
        (1, TS("2024-01-01 12:00:00"), 3),
    ])
    rows = {(r["user_id"], r["session_idx"]): r
            for r in session_stats(ev, "user_id", "ts").collect()}
    s0 = rows[(1, 0)]
    assert s0["n_events"] == 2 and s0["duration_us"] == 600 * 10**6
    s1 = rows[(1, 1)]
    assert s1["n_events"] == 1 and s1["duration_us"] == 0


def test_asof_plan_one_exchange_no_join(spark):
    left = _mk_events(spark, [(1, TS("2024-01-01"), 1)])
    right = _mk_events(spark, [(1, TS("2024-01-01"), 2)])
    out = asof_join(left, right, on="user_id", ts="ts",
                    right_cols=["event_id"], tiebreak="event_id")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    assert "Join" not in p, p[:2000]


def test_sessionize_agg_reuses_window_exchange(spark):
    ev = _mk_events(spark, [(1, TS("2024-01-01"), 1)])
    p = (session_stats(ev, "user_id", "ts")
         ._jdf.queryExecution().executedPlan().toString())
    # HashPartitioning(user_id) must satisfy the (user_id,
    # session_idx) aggregate: exactly ONE exchange end-to-end
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "user_id BIGINT, session_idx BIGINT,"
              " sess_start_us BIGINT, sess_end_us BIGINT")


def _pt(spark, rows):
    from datetime import datetime, timezone

    def us2ts(us):
        return datetime.fromtimestamp(us / 1e6, tz=timezone.utc) \
            .replace(tzinfo=None)
    return spark.createDataFrame(
        [(u, us2ts(us), i) for (u, us, i) in rows],
        "user_id BIGINT, ts TIMESTAMP, pid BIGINT")


def test_point_in_interval_inclusive_bounds_and_bin_spanning(spark):
    from textract_demo_spark.datapipe.temporal import \
        point_in_interval_join
    B = 1_000_000  # 1s bins
    iv = _iv(spark, [
        (1, 0, 5 * B, 12 * B),    # spans bins 5..12
        (1, 1, 20 * B, 20 * B),   # zero-length interval
        (2, 0, 5 * B, 6 * B),
    ])
    pts = _pt(spark, [
        (1, 5 * B, 1),        # exactly at start -> match
        (1, 12 * B, 2),       # exactly at end -> match
        (1, 9 * B + 17, 3),   # interior, mid-bin
        (1, 13 * B, 4),       # past end -> no match
        (1, 20 * B, 5),       # zero-length interval hit
        (2, 5 * B + 1, 6),    # other key
        (3, 5 * B + 1, 7),    # key with no intervals
    ])
    out = point_in_interval_join(pts, iv, on="user_id", ts="ts",
                                 bin_us=B)
    got = {r["pid"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 0, 5: 1, 6: 0}


def test_point_in_interval_left_keeps_unmatched(spark):
    from textract_demo_spark.datapipe.temporal import \
        point_in_interval_join
    B = 1_000_000
    iv = _iv(spark, [(1, 0, 5 * B, 6 * B)])
    pts = _pt(spark, [(1, 5 * B, 1), (1, 99 * B, 2)])
    out = point_in_interval_join(pts, iv, on="user_id", ts="ts",
                                 bin_us=B, how="left")
    got = {r["pid"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 0, 2: None}


def test_point_in_interval_plan_no_bnlj(spark):
    from textract_demo_spark.datapipe.temporal import \
        point_in_interval_join
    iv = _iv(spark, [(1, 0, 0, 10)])
    pts = _pt(spark, [(1, 5, 1)])
    p = (point_in_interval_join(pts, iv, on="user_id", ts="ts",
                                bin_us=1_000_000)
         ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "CartesianProduct" not in p, p[:2000]
