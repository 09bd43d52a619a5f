"""The vectorized parse stage: fetch results → long-format outputs.

One ``mapInPandas`` pass per wave emits, per fetched page:

- ``kind='record'`` rows — one per extracted record, with (level, data)
  where data is the record's canonical JSON (typed views come from
  F.from_json with the family schema downstream);
- one ``kind='text'`` row — the page's extracted text, the byte-identical
  per-url invariant (BASELINE.json input_hint);
- ``kind='child'`` rows — discovered URLs (two-hop kubra discovery, O6),
  with child_rank preserving discovery order (ga_scraper.py:393–403);
- ``kind='error'`` rows — per-URL failure capture (O23); a payload that
  fails to parse never aborts the wave, mirroring the reference's per-URL
  try/except (app/main.py:22–41).

Narrow stage: no shuffle — it runs on the fetch stage's partitioning.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..sources.fixtures import endpoint_kind
from .families import canonical_text, parse_payload

PARSE_OUT_SCHEMA = (
    "url string, host string, state string, layout string, emc string, "
    "family string, depth int, event_seq int, seed_seq int, child_seq int, "
    "wave int, kind string, level string, data string, text string, "
    "child_url string, child_rank int, status int, reason string"
)

_CARRY = [
    "url", "host", "state", "layout", "emc", "family",
    "depth", "event_seq", "seed_seq", "child_seq", "wave",
]


def parse_wave(fetched: DataFrame) -> DataFrame:
    """Parse every 200-status page; pass fetch failures through as errors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for rec in batch.to_dict("records"):
                carry = {c: rec[c] for c in _CARRY}
                if rec["status"] != 200 or rec["html"] is None:
                    rows.append(
                        {**carry, "kind": "error", "level": None, "data": None,
                         "text": None, "child_url": None, "child_rank": None,
                         "status": rec["status"], "reason": rec["reason"]}
                    )
                    continue
                try:
                    kind = endpoint_kind(rec["url"], rec["family"])
                    levels, children = parse_payload(kind, bytes(rec["html"]))
                except Exception as e:
                    rows.append(
                        {**carry, "kind": "error", "level": None, "data": None,
                         "text": None, "child_url": None, "child_rank": None,
                         "status": 598, "reason": f"parse: {e}"}
                    )
                    continue
                for level, recs in levels.items():
                    for r in recs:
                        rows.append(
                            {**carry, "kind": "record", "level": level,
                             "data": json.dumps(r, separators=(",", ":"), ensure_ascii=False),
                             "text": None, "child_url": None, "child_rank": None,
                             "status": 200, "reason": None}
                        )
                rows.append(
                    {**carry, "kind": "text", "level": None, "data": None,
                     "text": canonical_text(levels), "child_url": None,
                     "child_rank": None, "status": 200, "reason": None}
                )
                for rank, child in enumerate(children):
                    rows.append(
                        {**carry, "kind": "child", "level": None, "data": None,
                         "text": None, "child_url": child, "child_rank": rank,
                         "status": 200, "reason": None}
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    *_CARRY, "kind", "level", "data", "text",
                    "child_url", "child_rank", "status", "reason",
                ],
            )

    return fetched.mapInPandas(run, PARSE_OUT_SCHEMA)
