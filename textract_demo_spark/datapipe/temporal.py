"""Temporal operators over keyed event/turn streams: as-of join and
gap sessionization — both pure DataFrame compositions (no UDF, no
driver-side state).

Scale notes (the design constraints at 10^12 events):

- ``asof_join``: Spark has no ASOF JOIN operator, and the naive
  formulations are scale-killers — a theta join on
  ``r.ts <= l.ts`` is a broadcast-nested-loop/cartesian, and a
  per-row correlated subquery is O(n^2). This implementation is the
  union-tag pattern: tag both sides, union them (a zero-shuffle
  narrow op), and take ``last(right_payload, ignorenulls=True)`` over
  a window partitioned by the join key and ordered by
  (ts, side, right-tiebreak). Cost: ONE exchange on the key + one
  sort — identical shape to any keyed window, no join node at all.
  Skewed keys cost what any window on that key costs; salting does
  not apply (the window is order-dependent), but key cardinality for
  as-of joins (user, conversation, instrument) is normally >> cores.
- ``sessionize``: lag + running-sum-of-boundaries over the same keyed
  window, then an aggregate keyed by (key, session_idx). Because the
  window exchange already hash-partitions by the key, and
  HashPartitioning(key) satisfies ClusteredDistribution(key,
  session_idx), the aggregate reuses the window's exchange: the whole
  operator is ONE shuffle end-to-end (gated in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col) -> Column:
    """Epoch microseconds; accepts TIMESTAMP and TIMESTAMP_NTZ (the
    cast is a no-op for the former; for the latter the repo contract
    pins spark.sql.session.timeZone=UTC, so NTZ wall time == UTC)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str], tiebreak: str | None = None,
              allow_exact_matches: bool = False,
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: for every left row, attach the right row with
    the greatest ``ts`` at-or-before (``allow_exact_matches=True``) or
    strictly-before (default) the left row's ``ts``, per ``on`` key —
    pandas ``merge_asof`` semantics, distributed.

    ``right_cols`` are the right-side columns to carry (emitted as
    ``{prefix}{col}``); ``tiebreak`` (a right-side column, e.g. an
    event id) makes the winner among equal-``ts`` right rows
    deterministic: the LARGEST tiebreak wins. Left rows with no prior
    right row get nulls (left-outer semantics).

    Implementation: union-tag + keyed window (module docstring); the
    plan is one Exchange on ``on`` + one sort, no join node.
    """
    # side ordering at equal ts decides visibility: right-before-left
    # = exact matches visible; left-before-right = strictly-before
    r_side, l_side = (0, 1) if allow_exact_matches else (2, 1)
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    tagged_r = right.select(
        F.col(on).alias(on), F.col(ts).alias(ts),
        F.lit(r_side).alias("_side"),
        (F.col(tiebreak) if tiebreak is not None
         else F.lit(0)).cast("long").alias("_tie"),
        payload.alias("_r"))
    tagged_l = left.select(
        "*", F.lit(l_side).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(tagged_r.schema["_r"].dataType).alias("_r"))
    # align schemas: left keeps all its columns; right rows carry null
    # for them (they are dropped after the window)
    for c in left.columns:
        if c not in (on, ts):
            tagged_r = tagged_r.withColumn(
                c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = tagged_l.unionByName(tagged_r.select(tagged_l.columns))
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts).asc(), F.col("_side").asc(),
                  F.col("_tie").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == l_side).drop("_side", "_tie", "_r")
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_m.{c}"))
    return out.drop("_m")


def sessionize(events: DataFrame, key: str, ts: str,
               gap_us: int = 30 * 60 * 1_000_000,
               order_tiebreak: str | None = None) -> DataFrame:
    """Gap sessionization: per ``key``, a new session starts when the
    time since the previous event exceeds ``gap_us`` microseconds.
    Returns the input plus ``session_idx`` (0-based per key).

    One exchange: the keyed window computes lag + a running sum of
    boundary flags in a single window spec.
    """
    order = [F.col(ts).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    us = _us(ts)
    prev = F.lag(us).over(w)
    boundary = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return events.withColumn(
        "session_idx",
        (F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
         - 1).cast("long"))


def session_stats(events: DataFrame, key: str, ts: str,
                  gap_us: int = 30 * 60 * 1_000_000,
                  order_tiebreak: str | None = None) -> DataFrame:
    """Per-session aggregates (count, start/end, duration in us).
    The aggregate reuses ``sessionize``'s exchange — one shuffle
    total (HashPartitioning(key) satisfies the (key, session_idx)
    clustering; plan-gated)."""
    s = sessionize(events, key, ts, gap_us, order_tiebreak)
    us = _us(ts)
    return (s.groupBy(key, "session_idx")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.min(us).alias("sess_start_us"),
                 F.max(us).alias("sess_end_us"))
            .withColumn("duration_us",
                        (F.col("sess_end_us")
                         - F.col("sess_start_us")).cast("long")))


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           on: str, ts: str,
                           start_col: str = "sess_start_us",
                           end_col: str = "sess_end_us",
                           bin_us: int = 2 * 3600 * 1_000_000,
                           how: str = "inner") -> DataFrame:
    """Point-in-interval (range) join: attach every interval row that
    contains the point's timestamp, per ``on`` key. Spark would plan
    the naive theta join ``start <= ts AND ts <= end`` as a
    broadcast-nested-loop (or worse, a cartesian) — a scale-killer.
    This is the standard binning rewrite: intervals explode to the
    coarse time bins they cover, points compute their single bin, and
    the join becomes an EQUALITY join on (key, bin) + a residual
    containment filter — shuffle-partitionable, AQE-skew-splittable,
    plan-gated (no BNLJ/CartesianProduct).

    ``bin_us`` trades interval fanout (rows ≈ length/bin per
    interval) against join selectivity (points per bin); set it near
    the TYPICAL interval length — e.g. the session gap when joining
    against gap sessions. Bounds are inclusive. Points in no interval
    are dropped with ``how='inner'`` (default) or kept with nulls via
    ``how='left'`` (dedup to one row per unmatched point).
    """
    ts_us = _us(ts)
    binned_iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            (F.col(start_col) / bin_us).cast("long"),
            (F.col(end_col) / bin_us).cast("long"))))
    pts = points.withColumn("_pus", ts_us).withColumn(
        "_bin", (F.col("_pus") / bin_us).cast("long"))
    matched = (pts.join(binned_iv, [on, "_bin"], "inner")
               .filter((F.col(start_col) <= F.col("_pus"))
                       & (F.col("_pus") <= F.col(end_col)))
               .drop("_bin"))
    if how == "inner":
        return matched.drop("_pus")
    if how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    iv_cols = [c for c in intervals.columns if c != on]
    unmatched = (pts.join(matched.select(on, "_pus").distinct(),
                          [on, "_pus"], "left_anti").drop("_bin"))
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched).drop("_pus")
