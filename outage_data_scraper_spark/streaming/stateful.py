"""Custom stateful streaming operator: incremental outage sessionization.

The batch sessionizers (operators/sessionize.py) need the whole series;
this is their streaming form — `applyInPandasWithState` tracks one open
outage session per (utility, county) key across micro-batches and emits a
session row the moment the feed shows customers-out back at/below the
threshold, or when the key times out (no observations past the timeout →
the session is closed as stale).

This is the engine shape for the reference's polling semantics run
continuously: each crawl wave appends observations; the tracker emits
finished outages with no re-read of history (state is O(open sessions),
not O(observations) — the property that matters at 10^10 scale).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "emc string, session_start timestamp, session_end timestamp, "
    "duration_min double, n_obs long, peak_out long, closed_by string"
)
STATE_SCHEMA = "start long, last long, n long, peak long"


def _track(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: int = 0,
    stale_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    (emc,) = key
    if state.hasTimedOut:
        # stale key: no observations within the processing-time timeout —
        # close the open session as-is so liveness never depends on the
        # feed recovering
        if state.exists:
            s, last, n, p = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "emc": emc,
                        "session_start": pd.Timestamp(s, unit="s"),
                        "session_end": pd.Timestamp(last, unit="s"),
                        "duration_min": (last - s) / 60.0,
                        "n_obs": n,
                        "peak_out": p,
                        "closed_by": "timeout",
                    }
                ]
            )
        return
    rows = pd.concat(list(pdfs)).sort_values("ts")
    cur: tuple[int, int, int, int] | None = state.get if state.exists else None
    out: list[dict[str, Any]] = []
    for ts, val in zip(rows["ts"], rows["out"]):
        epoch = int(ts.timestamp())
        val = int(val)
        if val > threshold:
            if cur is None:
                cur = (epoch, epoch, 1, val)
            else:
                s, _, n, p = cur
                cur = (s, epoch, n + 1, max(p, val))
        elif cur is not None:
            s, last, n, p = cur
            out.append(
                {
                    "emc": emc,
                    "session_start": pd.Timestamp(s, unit="s"),
                    "session_end": pd.Timestamp(last, unit="s"),
                    "duration_min": (last - s) / 60.0,
                    "n_obs": n,
                    "peak_out": p,
                    "closed_by": "recovered",
                }
            )
            cur = None
    if cur is not None:
        state.update(cur)
        if stale_timeout_ms is not None:
            state.setTimeoutDuration(stale_timeout_ms)
    elif state.exists:
        state.remove()
    if out:
        yield pd.DataFrame(out)


def streaming_sessionize(
    observations: DataFrame, threshold: int = 0, stale_timeout_ms: int | None = None
) -> DataFrame:
    """observations: streaming DF (emc string, ts timestamp, out long).

    ``stale_timeout_ms``: close a key's open session with
    closed_by='timeout' after that much processing time with no new
    observations (ProcessingTimeTimeout). None keeps sessions open until
    the feed recovers — the reference's effective behavior, since its
    pollers simply stop writing rows when a site goes quiet.
    """

    def fn(key, pdfs, state):
        yield from _track(
            key, pdfs, state, threshold=threshold, stale_timeout_ms=stale_timeout_ms
        )

    conf = (
        GroupStateTimeout.NoTimeout
        if stale_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return observations.groupBy("emc").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
