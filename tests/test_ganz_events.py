"""step1_ganz parity: the relative-threshold (θ × CustomersTracked),
inclusive-``>=``-crossing event detector, judged by the ACTUAL reference
code exec'd from /root/reference/scripts/bluefire/step1_ganz.py."""

import pathlib
import random

import pandas as pd
import pytest

from outage_data_scraper_spark.operators.sessionize import ganz_events

REF_PATH = pathlib.Path("/root/reference/scripts/bluefire/step1_ganz.py")
TS0 = pd.Timestamp("2024-01-01 00:00:00")
COLS = [
    "UtilityName", "StateName", "CountyName", "CityName",
    "CountyFIPS", "CustomersTracked", "CustomersOut", "RecordDateTime",
]


@pytest.fixture(scope="module")
def ref_ganz():
    """Exec the reference source up to its argparse block: yields the real
    is_new / helper / merger function objects."""
    src = REF_PATH.read_text()
    cut = src.index("parser = argparse.ArgumentParser()")
    ns: dict = {}
    exec(compile(src[:cut], str(REF_PATH), "exec"), ns)
    return ns


def _reference_pipeline(ns, pdf, threshold):
    """The reference's outer loop (step1_ganz.py:140–166 dedup + is_new
    segmentation + merger, :173 duration>0 filter), run with the exec'd
    reference functions on dict rows."""
    idx = pdf.groupby(
        ["UtilityName", "StateName", "CountyName", "CityName", "RecordDateTime"]
    )["CustomersOut"].idxmin()
    pdf = pdf.loc[idx]
    result, outage_rows, last_row = [], [], None
    for row in pdf.to_dict("records"):
        if ns["is_new"](last_row, row):
            if outage_rows:
                result += [r for r in ns["merger"](outage_rows, threshold) if r]
            outage_rows = []
        outage_rows.append(row)
        last_row = row
    if outage_rows:
        result += [r for r in ns["merger"](outage_rows, threshold) if r]
    return sorted(
        (
            r["UtilityName"],
            r["start_time"],
            r["end_time"],
            int(r["duration"].total_seconds()),
            round(float(r["customer_affected_mean"]), 9),
        )
        for r in result
        if r["duration"].total_seconds() > 0
    )


def _spark_events(spark, pdf, threshold):
    got = ganz_events(spark.createDataFrame(pdf), threshold=threshold).collect()
    return sorted(
        (
            r.UtilityName,
            pd.Timestamp(r.start_time),
            pd.Timestamp(r.end_time),
            r.duration_s,
            round(r.customer_affected_mean, 9),
        )
        for r in got
    )


def _series_pdf(series_by_utility, tracked=1000):
    rows = []
    for util, outs in series_by_utility.items():
        for i, out in enumerate(outs):
            rows.append(
                (util, "ga", "cty", "city", "0", tracked, out,
                 TS0 + pd.Timedelta(minutes=15 * i))
            )
    return pd.DataFrame(rows, columns=COLS)


def _check(spark, ref_ganz, series_by_utility, threshold=0.05, tracked=1000):
    pdf = _series_pdf(series_by_utility, tracked)
    want = _reference_pipeline(ref_ganz, pdf, threshold)
    got = _spark_events(spark, pdf, threshold)
    assert got == want
    return got


def test_inclusive_boundary_starts_event(spark, ref_ganz):
    # reading == θ×tracked (50 = 0.05×1000) must OPEN the event (>=, not >)
    got = _check(spark, ref_ganz, {"u1": [50, 60, 10]})
    assert len(got) == 1
    # the terminating below row is INCLUDED: end = third timestamp
    assert got[0][3] == 1800


def test_exclusive_boundary_ends_event(spark, ref_ganz):
    # a fall back to exactly θ×tracked does NOT end the event (< is strict)
    got = _check(spark, ref_ganz, {"u1": [60, 50, 50, 10]})
    assert len(got) == 1 and got[0][3] == 2700


def test_unclosed_run_at_segment_end_is_dropped(spark, ref_ganz):
    assert _check(spark, ref_ganz, {"u1": [60, 70, 80]}) == []


def test_zero_row_terminates_event_and_splits_segment(spark, ref_ganz):
    # 0 is below threshold → closes the event; next row opens a new segment
    got = _check(spark, ref_ganz, {"u1": [60, 0, 70, 80, 10]})
    assert len(got) == 2


def test_below_rows_between_events_are_noise(spark, ref_ganz):
    got = _check(spark, ref_ganz, {"u1": [10, 20, 60, 10, 20, 70, 5, 10]})
    assert len(got) == 2


def test_duplicate_ts_dedups_to_min(spark, ref_ganz):
    pdf = _series_pdf({"u1": [60, 70, 10]})
    dup = pdf.iloc[[1]].copy()
    dup["CustomersOut"] = 40  # duplicate ts, smaller reading wins → below θ? no: 40 < 50
    pdf = pd.concat([pdf, dup], ignore_index=True)
    want = _reference_pipeline(ref_ganz, pdf, 0.05)
    got = _spark_events(spark, pdf, 0.05)
    assert got == want


def test_time_weighted_mean_excludes_last_row(spark, ref_ganz):
    # helper (step1_ganz.py:49–57): mean = Σ gapᵢ·outᵢ / duration over
    # consecutive pairs — the final row's reading never contributes
    got = _check(spark, ref_ganz, {"u1": [100, 200, 10]})
    assert got[0][4] == pytest.approx((900 * 100 + 900 * 200) / 1800.0)


def test_randomized_multi_group_parity(spark, ref_ganz):
    rng = random.Random(13)
    for trial in range(4):
        series = {
            f"u{g}": [rng.choice([0, 5, 20, 45, 50, 55, 80, 200, 600]) for _ in range(50)]
            for g in range(5)
        }
        _check(spark, ref_ganz, series, threshold=0.05)
        _check(spark, ref_ganz, series, threshold=0.2)
