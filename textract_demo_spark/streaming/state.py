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
