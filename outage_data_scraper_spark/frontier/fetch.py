"""Distributed fetch stage: mapInPandas batches with politeness pacing.

Replaces the reference's sequential per-URL loop (app/main.py:21–41) and
its urlopen/selenium I/O (app/scrapers/util.py:63–89). One Spark stage per
wave: the popped frontier batch is repartitioned by ``salted_part`` (host
co-location), then each partition walks its Arrow batches, paces per-host
token buckets, and calls a pluggable fetcher.

Fetchers are pure callables ``url -> (status, reason, payload_bytes)``;
tests use the deterministic fixture renderer, the bench uses a latency
model with a simulated clock — the engine never needs the real network to
be validated (SURVEY.md §5). Speculative execution must stay off: fetches
are side-effecting (session.py sets spark.speculation=false).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .politeness import HostPacer

# (url, family) → status, reason, payload
FetchFn = Callable[[str, str], tuple[int, str | None, bytes | None]]

FETCH_RESULT_SCHEMA = (
    "url string, host string, state string, layout string, emc string, "
    "family string, depth int, event_seq int, seed_seq int, child_seq int, "
    "wave int, status int, reason string, bytes long, html binary, "
    "partition_id int, wait_s double"
)

_IN_COLS = [
    "url", "host", "state", "layout", "emc", "family",
    "depth", "event_seq", "seed_seq", "child_seq", "wave",
]


def fetch_wave(
    popped: DataFrame,
    fetcher_factory: Callable[[], FetchFn],
    num_parts: int = 32,
    rate_per_host: float = 1.0,
    salt: int = 1,
    simulated_clock: bool = True,
    rate_overrides: dict[str, float] | None = None,
) -> DataFrame:
    """Fetch every popped URL; returns FETCH_RESULT_SCHEMA rows.

    ``fetcher_factory`` is called once per partition (so connection pools /
    fixture stores initialize executor-side, not on the driver).
    ``rate_overrides``: host → req/s from robots Crawl-delay (broadcast
    via task closure; the robots table is tiny).
    """
    from pyspark import TaskContext

    part = popped.repartition(num_parts, "salted_part").select(*_IN_COLS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()
        pacer = HostPacer(
            rate_per_host, salt=salt, sim=simulated_clock, rate_overrides=rate_overrides
        )
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for batch in batches:
            # Deterministic within-partition order = the crawl-ordering law.
            batch = batch.sort_values(
                ["event_seq", "seed_seq", "depth", "child_seq", "url"]
            )
            out = {
                "status": [], "reason": [], "bytes": [], "html": [], "wait_s": [],
            }
            for url, h, fam in zip(batch["url"], batch["host"], batch["family"]):
                wait = pacer.acquire(h)
                try:
                    status, reason, payload = fetcher(url, fam)
                except Exception as e:  # failure-capture side output (O23)
                    status, reason, payload = 599, str(e), None
                out["status"].append(status)
                out["reason"].append(reason)
                out["bytes"].append(len(payload) if payload is not None else 0)
                out["html"].append(payload)
                out["wait_s"].append(wait)
            res = batch.reset_index(drop=True)
            for k, v in out.items():
                res[k] = v
            res["partition_id"] = pid
            yield res[
                _IN_COLS
                + ["status", "reason", "bytes", "html", "partition_id", "wait_s"]
            ]

    return part.mapInPandas(run, FETCH_RESULT_SCHEMA)
