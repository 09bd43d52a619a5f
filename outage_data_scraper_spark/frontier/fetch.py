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

    Per-host rate overrides (robots Crawl-delay) arrive as a nullable
    ``rate_override`` column on ``popped`` (req/s), joined in by the
    robots gate — never a driver-side host dict, which would OOM at
    10^8-host scale. ``rate_overrides`` (host → req/s dict) remains for
    small/test configurations.
    """
    from pyspark import TaskContext

    has_rate_col = "rate_override" in popped.columns
    has_lanes_col = "n_lanes" in popped.columns
    in_cols = _IN_COLS + (["rate_override"] if has_rate_col else []) + (
        ["n_lanes"] if has_lanes_col else []
    )
    part = popped.repartition(num_parts, "salted_part").select(*in_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()
        pacer = HostPacer(
            rate_per_host, salt=salt, sim=simulated_clock, rate_overrides=rate_overrides
        )
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        # Materialize the WHOLE partition's metadata rows before sorting:
        # the ordering law is per-partition, and a wave partition larger
        # than one Arrow batch (~10k rows) must not fall back to
        # batch-local order. Metadata rows are ~100 bytes — cheap. The
        # FETCHED PAYLOADS are not partition-buffered: the sorted frame is
        # walked in 10k-row chunks, each fetched and yielded before the
        # next starts, so peak task memory is O(chunk payloads), not
        # O(partition payloads) (one pacer spans the chunks, keeping
        # politeness exact across the whole partition).
        chunks = list(batches)
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        # Deterministic within-partition order = the crawl-ordering law.
        pdf = pdf.sort_values(
            ["event_seq", "seed_seq", "depth", "child_seq", "url"]
        ).reset_index(drop=True)
        for lo in range(0, len(pdf), 10_000):
            chunk = pdf.iloc[lo : lo + 10_000].reset_index(drop=True)
            rates = chunk["rate_override"] if has_rate_col else [None] * len(chunk)
            lanes_col = chunk["n_lanes"] if has_lanes_col else [None] * len(chunk)
            out = {"status": [], "reason": [], "bytes": [], "html": [], "wait_s": []}
            for url, h, fam, rate, ln in zip(
                chunk["url"], chunk["host"], chunk["family"], rates, lanes_col
            ):
                wait = pacer.acquire(
                    h,
                    None if rate is None or pd.isna(rate) else float(rate),
                    None if ln is None or pd.isna(ln) else int(ln),
                )
                try:
                    status, reason, payload = fetcher(url, fam)
                except Exception as e:  # failure-capture side output (O23)
                    status, reason, payload = 599, str(e), None
                out["status"].append(status)
                out["reason"].append(reason)
                out["bytes"].append(len(payload) if payload is not None else 0)
                out["html"].append(payload)
                out["wait_s"].append(wait)
            for k, v in out.items():
                chunk[k] = v
            chunk["partition_id"] = pid
            yield chunk[
                _IN_COLS + ["status", "reason", "bytes", "html", "partition_id", "wait_s"]
            ]

    return part.mapInPandas(run, FETCH_RESULT_SCHEMA)
