"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (the brief's canonical custom-stateful shape;
nothing comparable exists in the reference — §2.9 extension).

State per user: (open-session count, last event timestamp).  An event
more than ``gap`` after the last one opens a new session; a processing-
time timeout flushes idle users.  Output rows are cumulative per-user
``(user_id, n_sessions, n_events)`` snapshots, one per micro-batch in
which the user appeared (or timed out).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "n_sessions long, n_events long, last_ts_ms long"

GAP_MS = 30 * 60 * 1000


def _make_update(idle_timeout: bool):
    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n_sessions, n_events, _ = state.get
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
            )
            state.remove()
            return

        n_sessions, n_events, last_ts_ms = state.get if state.exists else (0, 0, None)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            ts_ms = int(ts.value // 1_000_000)
            if last_ts_ms is None or ts_ms - last_ts_ms > GAP_MS:
                n_sessions += 1
            last_ts_ms = ts_ms
            n_events += 1
        state.update((n_sessions, n_events, last_ts_ms))
        if idle_timeout:
            state.setTimeoutDuration(60 * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return _update


def stateful_sessionize(events: DataFrame, idle_timeout: bool = False) -> DataFrame:
    """``events`` needs (user_id, event_id, ts).  Returns the streaming
    cumulative session/event counts per user.

    ``idle_timeout=True`` enables processing-time timers that flush and
    drop idle users' state (bounding state size on unbounded streams);
    timers keep the query triggering indefinitely, so drain-style tests
    and availableNow runs should leave it off.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(idle_timeout),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
