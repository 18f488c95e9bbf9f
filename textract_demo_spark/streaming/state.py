"""Keyed TTL state (T4): the reference's 7-day expiring ownership
cache as a real Spark stateful operator.

Reference semantics (``fn-notify-progress/main.py:36-40,82-131``): a
stream of execution events is enriched with the owning identity; the
mapping ExecutionId -> (IdentityId, S3Uri) is learned from events that
carry it and cached in an ExpiringDict (7-day TTL, ``main.py:39``)
backed by DynamoDB rows that carry the same TTL epoch
(``main.py:124``). Events arriving while the entry is warm get the
cached identity; after expiry the mapping is forgotten.

Spark mapping (SURVEY.md §2.9 T4): ``applyInPandasWithState`` over the
key, with BOTH
- an inline event-time TTL check (an event more than ``ttl`` past the
  entry's last refresh treats the cache as cold — deterministic
  semantics independent of watermark progress), and
- an event-time state timeout (``GroupStateTimeout.EventTimeTimeout``
  + ``setTimeoutTimestamp``) so Spark actually evicts idle state once
  the watermark passes last_refresh + ttl — the memory bound at
  10^8 live keys; without it state grows forever.

The round-1 build approximated T4 with watermark-bounded dedup state;
this module is the real keyed-TTL stateful form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("exec_id string, ts timestamp, owner string, "
                 "owner_from_cache boolean")
STATE_SCHEMA = "owner string, last_refresh_sec long"

WAIT_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, reviewed boolean, timed_out boolean, "
    "vendor string, date string, total string, worker_id string")
WAIT_STATE_SCHEMA = (
    "result_ts_sec long, rev_ts_sec long, "
    "rev_vendor string, rev_date string, rev_total string, "
    "rev_worker string")


def enrich_with_keyed_ttl_cache(events: DataFrame,
                                ttl_seconds: int = 7 * 24 * 3600,
                                watermark: str = "0 seconds") -> DataFrame:
    """Enrich an event stream with a per-key TTL-cached owner.

    ``events`` must carry (exec_id string, ts timestamp,
    owner string nullable): rows with a non-null ``owner`` refresh the
    cache entry (the reference learns the identity from the execution
    input embedded in some events, main.py:86-98); rows with a null
    ``owner`` are lookups. Output adds the resolved ``owner`` (null on
    a cold/expired cache) and ``owner_from_cache``.
    """

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_refresh + ttl with no new events:
            # drop the entry (the ExpiringDict/DynamoDB-TTL analog)
            state.remove()
            return
        owner, last_refresh = (state.get if state.exists
                               else (None, None))
        rows = pd.concat(list(pdfs)).sort_values("ts", kind="stable")
        out_owner: list[str | None] = []
        out_cached: list[bool] = []
        for r in rows.itertuples():
            ts_sec = int(r.ts.timestamp())
            expired = (last_refresh is not None
                       and ts_sec - last_refresh > ttl_seconds)
            if expired:
                owner, last_refresh = None, None
            if isinstance(r.owner, str) and r.owner:
                owner = r.owner
                last_refresh = ts_sec
                out_owner.append(owner)
                out_cached.append(False)
            else:
                out_owner.append(owner)
                out_cached.append(owner is not None)
        # same EventTimeTimeout hazard as review_wait_with_timeout:
        # a cache-read-only batch restores last_refresh from OLD state
        # and re-parking at last_refresh + ttl <= watermark would
        # throw. The entry is expired by event time anyway — drop it
        # (future events have ts > watermark > last_refresh + ttl, so
        # the per-row expiry check would null it regardless).
        if (last_refresh is not None
                and (last_refresh + ttl_seconds) * 1000
                <= state.getCurrentWatermarkMs()):
            last_refresh = None
        if last_refresh is None:
            state.remove()
        else:
            state.update((owner, last_refresh))
            state.setTimeoutTimestamp((last_refresh + ttl_seconds) * 1000)
        yield pd.DataFrame({
            "exec_id": [key[0]] * len(rows),
            "ts": list(rows["ts"]),
            "owner": out_owner,
            "owner_from_cache": out_cached,
        })

    return (events
            .withWatermark("ts", watermark)
            .groupBy("exec_id")
            .applyInPandasWithState(
                update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def review_wait_with_timeout(tagged: "DataFrame",
                             timeout_seconds: int = 3600,
                             watermark: str = "0 seconds") -> DataFrame:
    """Keyed wait-for-review with timeout (T3): the real stateful form
    of the reference's ``waitForTaskToken`` park —
    ``StateMachine.asl.json:66-82`` parks the execution until the
    review callback resumes it, with ``TimeoutSeconds: 3600``
    (asl.json:80); an expired wait surfaces as an unreviewed outcome.

    Input ``tagged`` is the union of the two streams on a shared
    schema (conv_id string, turn_idx int, ts timestamp, kind string
    ['result'|'review'], vendor string, date string, total string,
    worker_id string): 'result' rows are low-confidence turns entering
    the wait; 'review' rows are the human answers. One output row per
    waiting turn:

    - review with event time within ``timeout_seconds`` of the FIRST
      result's event time => reviewed=true with the answers
      (out-of-order arrival — review before result — is held and
      matched, the token round-trip analog J5);
    - a review whose event time is PAST result_ts + timeout is
      expired (the 3600s waitForTaskToken deadline is an event-time
      fact, not an arrival-order one): it never matches, and the turn
      surfaces as timed_out once the watermark passes the deadline;
    - duplicate results keep the FIRST result's event time — a replay
      must not extend the park window;
    - watermark passes result_ts + timeout with no in-time review =>
      reviewed=false, timed_out=true (the turn stays needs_review,
      exactly the batch left-join's absent-row semantics).

    Review selection: the first review to arrive wins (token
    semantics — the reference resumes on the first callback); within
    one micro-batch, rows are processed in event-time order, so the
    earliest-ts review of the batch is "first".
    """

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        def emit(reviewed: bool, timed_out: bool, vendor=None, date=None,
                 total=None, worker=None):
            return pd.DataFrame({
                "conv_id": [key[0]], "turn_idx": [key[1]],
                "reviewed": [reviewed], "timed_out": [timed_out],
                "vendor": [vendor], "date": [date], "total": [total],
                "worker_id": [worker]})

        if state.hasTimedOut:
            had_result = state.exists and state.get[0] is not None
            state.remove()
            if had_result:
                yield emit(False, True)
            # else: a stray held review with no matching result —
            # dropped, like a callback with an unknown token
            return
        (result_ts, rev_ts, rv, rd, rt, rw) = (
            state.get if state.exists
            else (None, None, None, None, None, None))
        rows = pd.concat(list(pdfs)).sort_values("ts", kind="stable")
        for r in rows.itertuples():
            ts_sec = int(r.ts.timestamp())
            if r.kind == "result":
                if result_ts is None:  # first result anchors the park
                    result_ts = ts_sec
            elif rw is None:  # first review wins (A11)
                rev_ts = ts_sec
                rv, rd, rt, rw = r.vendor, r.date, r.total, r.worker_id
        if result_ts is not None and rw is not None:
            if rev_ts <= result_ts + timeout_seconds:
                state.remove()
                yield emit(True, False, rv, rd, rt, rw)
                return
            # review past the event-time deadline: expired — drop it
            # and keep the park; the state timeout surfaces timed_out
            rev_ts = rv = rd = rt = rw = None
        # EventTimeTimeout rejects a timeout at/behind the current
        # watermark (IllegalArgumentException kills the query), which
        # can happen when a group gets data — e.g. a late-but-in-
        # watermark review — in a micro-batch whose watermark already
        # passed result_ts + timeout. Resolve the expiry inline then.
        wm_ms = state.getCurrentWatermarkMs()
        if result_ts is not None:
            deadline_ms = (result_ts + timeout_seconds) * 1000
            if deadline_ms <= wm_ms:
                if state.exists:
                    state.remove()
                yield emit(False, True)
                return
            # park with the reference's timeout from the RESULT's
            # event time; the timeout fires once the watermark passes
            state.update((result_ts, None, None, None, None, None))
            state.setTimeoutTimestamp(deadline_ms)
        elif rw is not None:
            deadline_ms = (rev_ts + timeout_seconds) * 1000
            if deadline_ms <= wm_ms:
                # stray held review already past its TTL: dropped,
                # like a callback with an unknown token (no emit)
                if state.exists:
                    state.remove()
                return
            # review before result (out-of-order): hold the answers,
            # bounded by the same TTL-style timeout from the review ts
            state.update((None, rev_ts, rv, rd, rt, rw))
            state.setTimeoutTimestamp(deadline_ms)
        return

    return (tagged
            .withWatermark("ts", watermark)
            .groupBy("conv_id", "turn_idx")
            .applyInPandasWithState(
                update,
                outputStructType=WAIT_OUTPUT_SCHEMA,
                stateStructType=WAIT_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
