"""Stateful streaming sessionization (streaming/stateful.py):
applyInPandasWithState with event-time timeout, replayed over
time-ordered file micro-batches. Tests pin the probe-confirmed
semantics the q84 oracle encodes: strict-inequality timeout firing,
the final no-data batch, data-beats-timeout labeling, the
non-final-but-timed-out label case, and run-to-run determinism."""

from __future__ import annotations

import datetime as dt

import pytest

E = dt.datetime(2024, 1, 1)
_E_US = 1_704_067_200 * 1_000_000  # epoch µs of E


def _ts(s: float) -> dt.datetime:
    return E + dt.timedelta(seconds=s)


def us(s: float) -> int:
    return _E_US + int(round(s * 1_000_000))


def _run(spark, tmp_path, rows, thresholds, gap_s=60, delay_s=50, tag="x"):
    from outage_data_scraper_spark.streaming.stateful import run_stateful_sessions

    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = run_stateful_sessions(
        spark, ev, thresholds, str(tmp_path / f"ss_{tag}"),
        ts_col="ts", key_col="user_id", gap_s=gap_s, delay_s=delay_s,
    )
    return {
        (r.key, r.s_start_us, r.s_end_us, r.n_events, r.closed_by)
        for r in out.collect()
    }


def test_gap_timeout_and_never_emitted(spark, tmp_path):
    rows = [
        (1, _ts(0)), (1, _ts(30)), (2, _ts(10)),   # file 1 (max 30)
        (1, _ts(200)), (2, _ts(40)),               # file 2 (max 200)
        (3, _ts(400)),                             # file 3 (max 400)
    ]
    got = _run(spark, tmp_path, rows, [_ts(100), _ts(300)], tag="a")
    assert got == {
        (1, us(0), us(30), 2, "gap"),        # closed by the 200 event
        (1, us(200), us(200), 1, "timeout"), # 260 < final wm 350
        (2, us(10), us(40), 2, "timeout"),   # 100 < 350
        # key 3 (400): timeout 460 > 350 — never emits
    }


def test_timeout_equal_to_watermark_does_not_fire(spark, tmp_path):
    # key 1 single event at 0 → timeout 60s; final wm = 110 − 50 = 60
    # exactly: strict inequality → NOT emitted
    rows = [(1, _ts(0)), (2, _ts(110))]
    got = _run(spark, tmp_path, rows, [_ts(100)], tag="b")
    assert got == set()
    # one microsecond later, it fires
    rows = [(1, _ts(0)), (2, _ts(110.001))]
    got = _run(spark, tmp_path, rows, [_ts(100)], tag="c")
    assert got == {(1, us(0), us(0), 1, "timeout")}


def test_nonfinal_session_label_depends_on_batch_watermark(spark, tmp_path):
    # key 1: events at 0 (file 1) and 5000 (file 4) — two sessions; the
    # first can close EITHER by timeout in batch 3 (key 1 has no data
    # there; its wm = cm(file 2) − delay) or by the successor in batch 4
    # (data beats timeout). Variant A: file 2 max = 200 → wm at batch 3
    # is 150 > 60 → 'timeout' fires before the successor. Variant B:
    # file 2 max = 100 → wm 50 < 60 → the successor closes it → 'gap'.
    # This is exactly the q84 oracle's cm(b_next − 2) rule.
    for mid, label, tag in ((200.0, "timeout", "d"), (100.0, "gap", "e")):
        rows = [
            (1, _ts(0)),                 # file 1
            (2, _ts(mid)),               # file 2
            (2, _ts(600)),               # file 3 (key 1 absent)
            (1, _ts(5000)), (2, _ts(5000)),  # file 4
        ]
        got = _run(
            spark, tmp_path, rows, [_ts(50), _ts(500), _ts(1000)], tag=tag
        )
        first = [g for g in got if g[0] == 1 and g[1] == us(0)]
        assert first == [(1, us(0), us(0), 1, label)], (mid, got)


def test_deterministic_across_runs(spark, tmp_path):
    import random

    rng = random.Random(9)
    rows = [
        (rng.randrange(6), _ts(rng.uniform(0, 4000)))
        for _ in range(300)
    ]
    a = _run(spark, tmp_path, rows, [_ts(1000), _ts(2000), _ts(3000)], tag="f")
    b = _run(spark, tmp_path, rows, [_ts(1000), _ts(2000), _ts(3000)], tag="g")
    assert a == b and len(a) > 0


def test_streaming_dedup_first_batch_wins_and_suppresses(spark, tmp_path):
    """A signature seen in batches 1 and 3 emits ONCE, with batch-1's
    min-(ts, id) row and batch-1-only count; a batch-3-only signature
    emits from batch 3; within a batch the (ts, id) tiebreak picks the
    lowest id."""
    from pyspark.sql import functions as F

    from outage_data_scraper_spark.streaming.stateful import run_streaming_dedup

    T = dt.datetime
    rows = [
        # batch 0 (< Jan 8): key A twice (tie on ts -> min id), key B once
        (1, T(2024, 1, 2, 10, 0), "A"),
        (2, T(2024, 1, 2, 10, 0), "A"),
        (3, T(2024, 1, 3, 9, 0), "B"),
        # batch 1: key A again (must NOT re-emit), key C appears
        (4, T(2024, 1, 9, 8, 0), "A"),
        (5, T(2024, 1, 10, 8, 0), "C"),
        # batch 3: key A yet again
        (6, T(2024, 1, 23, 8, 0), "A"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, k string")
    thresholds = [T(2024, 1, 8), T(2024, 1, 15), T(2024, 1, 22)]
    out = {
        r.sig: (r.first_ts_us, r.first_id, r.n_first_batch)
        for r in run_streaming_dedup(
            spark, ev, thresholds, str(tmp_path / "wd"), F.col("k"),
            ts_col="ts", id_col="event_id",
        ).collect()
    }
    us = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert out == {
        "A": (us(T(2024, 1, 2, 10, 0)), 1, 2),
        "B": (us(T(2024, 1, 3, 9, 0)), 3, 1),
        "C": (us(T(2024, 1, 10, 8, 0)), 5, 1),
    }


def test_streaming_dedup_ttl_eviction_islands(spark, tmp_path):
    """TTL contract: (a) a key skipping a batch with an event gap past
    the TTL re-emits; (b) ADJACENT-batch sightings never re-emit (the
    watermark lags one file); (c) a skip-batch key within the TTL does
    not re-emit. TTL 6 days, delay 900 s, weekly files."""
    from pyspark.sql import functions as F

    from outage_data_scraper_spark.streaming.stateful import (
        run_streaming_dedup_ttl,
    )

    T = dt.datetime
    rows = [
        # filler rows so every file exists and carries its week's max ts
        (100, T(2024, 1, 7, 23, 0), "F1"),
        (101, T(2024, 1, 14, 23, 0), "F2"),
        (102, T(2024, 1, 21, 23, 0), "F3"),
        (103, T(2024, 1, 28, 23, 0), "F4"),
        # (a) A: batch 1 early, batch 4 — cm(2)=Jan 14 23:00; gap >> 6d
        (1, T(2024, 1, 1, 8, 0), "A"),
        (6, T(2024, 1, 23, 8, 0), "A"),
        # (b) B: batches 1 and 2 (adjacent) — never re-emits
        (2, T(2024, 1, 1, 9, 0), "B"),
        (7, T(2024, 1, 9, 9, 0), "B"),
        # (c) C: batch 2 LATE then batch 4 — cm(3)−900s vs last+6d:
        # Jan 21 23:00 − 900 s < Jan 14 22:00 + 6 d → stays seen
        (3, T(2024, 1, 14, 22, 0), "C"),
        (8, T(2024, 1, 23, 9, 0), "C"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, k string")
    thresholds = [T(2024, 1, 8), T(2024, 1, 15), T(2024, 1, 22)]
    got = [
        (r.sig, r.first_id)
        for r in run_streaming_dedup_ttl(
            spark, ev, thresholds, str(tmp_path / "wd"), F.col("k"),
            ttl_s=6 * 86400, delay_s=900, ts_col="ts", id_col="event_id",
        ).orderBy("sig", "first_ts_us").collect()
    ]
    by_key: dict[str, list[int]] = {}
    for sig, fid in got:
        by_key.setdefault(sig, []).append(fid)
    assert by_key["A"] == [1, 6]          # re-emitted after eviction
    assert by_key["B"] == [2]             # adjacent batches: never
    assert by_key["C"] == [3]             # within TTL: suppressed
