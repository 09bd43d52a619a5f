"""Parity tests for the full step1_threshold concurrent-outage merger.

``_port_merger``/``_port_pipeline`` below are a compact, single-threaded
re-derivation of the reference pipeline (step1_threshold.py:37–331 merger,
:380–420 outer loop), kept dict-based like the original so the distributed
operator is checked against an INDEPENDENT expression of the same
semantics, not against itself.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from outage_data_scraper_spark.operators.sessionize import threshold_merger

TS0 = pd.Timestamp("2024-01-01 00:00:00")


def _port_merger(rows, threshold, abs_diff):
    """(ts, out) rows of one segment → closed outages, reference-faithful."""
    if not rows:
        return []
    res, trk = [], []
    prev = None
    for ts, out in rows:
        if not trk:
            trk.append({"st": ts, "en": ts, "rco": out, "tot": 0, "mean": out, "rdt": ts})
            prev = (ts, out)
            continue
        last = dict(trk[-1])
        d = out - prev[1]
        rel = threshold * last["rco"]
        if (d < rel or abs(d) < abs_diff) and out >= prev[1]:
            trk[-1]["en"] = ts
            trk[-1]["rco"] = last["rco"] + d
            trk[-1]["tot"] += (ts - last["en"]).total_seconds() * last["rco"]
            trk[-1]["mean"] = trk[-1]["tot"] / (trk[-1]["en"] - trk[-1]["st"]).total_seconds()
        elif (d >= rel and abs(d) >= abs_diff) and out >= prev[1]:
            trk.append({"st": ts, "en": ts, "rco": d, "tot": 0.0, "mean": d, "rdt": ts})
        elif (-d < rel or abs(d) < abs_diff) and out <= prev[1]:
            trk[-1]["en"] = ts
            trk[-1]["rco"] = last["rco"] + d
            trk[-1]["tot"] += (ts - last["en"]).total_seconds() * last["rco"]
            trk[-1]["mean"] = trk[-1]["tot"] / (trk[-1]["en"] - trk[-1]["st"]).total_seconds()
        elif (-d >= rel and abs(d) >= abs_diff) and out <= prev[1]:
            drop = prev[1] - out
            ci = 0
            for o in trk:
                if abs(drop - o["rco"]) < abs(drop - trk[ci]["rco"]):
                    ci = trk.index(o)
            pops = []
            if abs(drop - trk[ci]["rco"]) >= max(10, 0.1 * drop):
                if drop <= trk[ci]["rco"]:
                    dur = (trk[ci]["en"] - trk[ci]["st"]).total_seconds()
                    new = dict(trk[ci])
                    new["rco"] = trk[ci]["mean"] - drop
                    new["mean"] = trk[ci]["mean"] - drop
                    new["tot"] = new["mean"] * dur
                    trk.append(new)
                    trk[ci]["rco"] = drop
                    trk[ci]["mean"] = drop
                    trk[ci]["tot"] = drop * dur
                    pops.append(ci)
                else:
                    trk = sorted(trk, key=lambda o: o["rco"], reverse=True)
                    for o in trk:
                        if o["rco"] < drop:
                            ci = trk.index(o)
                            break
                    s = 0
                    for i in range(ci, len(trk)):
                        s += trk[i]["rco"]
                        if s >= drop:
                            s -= trk[i]["rco"]
                            continue
                        pops.append(i)
            else:
                pops.append(ci)
            for i in pops:
                trk[i]["en"] = ts
                trk[i]["tot"] += (ts - last["en"]).total_seconds() * trk[i]["rco"]
                trk[i]["mean"] = trk[i]["tot"] / (trk[i]["en"] - trk[i]["st"]).total_seconds()
                res.append((trk[i]["st"], trk[i]["en"], trk[i]["mean"],
                            int((trk[i]["en"] - trk[i]["st"]).total_seconds())))
                for k in ("rco", "tot", "rdt"):
                    trk[i].pop(k)
            trk = sorted(
                [dict(o) for o in trk if trk.index(o) not in pops],
                key=lambda o: o["st"],
            )
        else:
            continue  # case E: row matches no case; prev stays untouched
        prev = (ts, out)
    for o in trk:
        o["tot"] += (prev[0] - o["en"]).total_seconds() * o["rco"]
        o["en"] = prev[0]
        secs = (o["en"] - o["st"]).total_seconds()
        if secs == 0:
            continue
        o["mean"] = o["tot"] / secs
        res.append((o["st"], o["en"], o["mean"], int(secs)))
    return [r for r in res if r[3] > 0]


def _port_pipeline(series, threshold, abs_diff):
    """Outer loop: dedup (ts → min out, first occurrence), split segments
    after zero rows, merge each segment."""
    df = pd.DataFrame(series, columns=["ts", "out"])
    df["out"] = pd.to_numeric(df["out"])  # None → NaN (sortable)
    df = df.sort_values(["ts", "out"], kind="stable").drop_duplicates("ts", keep="first")
    out_rows, seg, prev = [], [], None
    for ts, out in zip(df["ts"], df["out"]):
        out = float("nan") if out is None or out != out else int(out)
        if prev is not None and prev == 0 and seg:
            out_rows += _port_merger(seg, threshold, abs_diff)
            seg = []
        seg.append((ts, out))
        prev = out
    if seg:
        out_rows += _port_merger(seg, threshold, abs_diff)
    return sorted(out_rows)


def _spark_rows(spark, series, threshold, abs_diff):
    pdf = pd.DataFrame(
        [
            ("u1", "ga", "cty", "city", "0", 1000, out, ts)
            for ts, out in series
        ],
        columns=[
            "UtilityName", "StateName", "CountyName", "CityName",
            "CountyFIPS", "CustomersTracked", "CustomersOut", "RecordDateTime",
        ],
    )
    pdf["CustomersOut"] = pd.to_numeric(pdf["CustomersOut"])
    df = spark.createDataFrame(pdf)
    got = threshold_merger(df, threshold=threshold, abs_diff=abs_diff).collect()
    return sorted(
        (pd.Timestamp(r.start_time), pd.Timestamp(r.end_time),
         r.customer_affected_mean, r.duration_s)
        for r in got
    )


def _mins(*outs):
    return [(TS0 + pd.Timedelta(minutes=15 * i), o) for i, o in enumerate(outs)]


def _check(spark, series, threshold=0.1, abs_diff=0.0):
    want = _port_pipeline(series, threshold, abs_diff)
    got = _spark_rows(spark, series, threshold, abs_diff)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3]
        assert g[2] == pytest.approx(w[2], abs=1e-9)
    return got


def test_single_outage_rise_and_final_close(spark):
    # case 0 + A only: one tracked outage closed at segment end
    got = _check(spark, _mins(100, 105, 108))
    assert len(got) == 1
    st, en, mean, dur = got[0]
    assert dur == 1800 and st == TS0


def test_case_b_opens_concurrent_outage_and_d_closes_it(spark):
    # 100 → 200 (case B: +100 ≥ 10% of 100) → 100 (case D: drop 100
    # exactly matches the second tracked outage) → final close of first
    got = _check(spark, _mins(100, 200, 100, 100))
    assert len(got) == 2


def test_case_d1_split_when_drop_smaller_than_nearest(spark):
    # one big tracked outage (500), drop of 120 ≥ max(10, 12) away from
    # 500 and ≤ 500 → D-1 split: close a 120-slice, keep the remainder
    got = _check(spark, _mins(500, 380, 380))


def test_case_d2_multi_pop(spark):
    # build three concurrent outages (100, +150, +200), then drop 330:
    # nearest is 200, |330-200|=130 ≥ 33 and 330 > 200 → D-2 closes a
    # size-descending run fitting inside the drop
    got = _check(spark, _mins(100, 250, 450, 120, 120))


def test_zero_rows_split_segments(spark):
    # zero CustomersOut ends the segment after it; next row starts fresh
    got = _check(spark, _mins(100, 0, 80, 80))
    assert len(got) == 2


def test_duplicate_timestamps_dedup_to_min(spark):
    series = _mins(100, 105, 108)
    series.append((series[1][0], 90))  # duplicate ts, smaller out wins
    _check(spark, series)


def test_abs_diff_floors_small_jumps(spark):
    # |Δ| < abs_diff forces case A/C even for large relative jumps
    _check(spark, _mins(10, 30, 12, 12), threshold=0.1, abs_diff=25.0)


def test_nan_observation_is_case_e_skip(spark):
    """A null CustomersOut mid-segment is the reference's case E: skipped
    with prev untouched — it must NOT close tracked outages or split the
    segment (coercing null→0 would do both)."""
    got = _check(spark, _mins(100, None, 105, 108))
    # one continuous outage spanning the NaN row, closed at segment end
    assert len(got) == 1
    assert got[0][3] == 2700  # 3 × 15-min steps: the NaN row's slot counts


def test_nan_opening_a_segment_poisons_it(spark):
    # reference parity: case 0 tracks the NaN itself; every later row
    # fails the NaN comparisons (case E), so the segment emits nothing
    got = _check(spark, _mins(0, None, 50, 80, 90))
    assert got == []


def test_randomized_parity_vs_port(spark):
    import random

    rng = random.Random(7)
    for trial in range(6):
        outs = []
        cur = rng.randint(50, 150)
        for _ in range(40):
            step = rng.choice([-120, -60, -15, -5, 0, 5, 15, 60, 120])
            cur = max(cur + step, 0)
            outs.append(cur)
        _check(spark, _mins(*outs), threshold=0.1, abs_diff=0.0)
        _check(spark, _mins(*outs), threshold=0.25, abs_diff=20.0)


def test_merger_monthly_property_report(spark):
    """step2_grower_property semantics: window on start_time, frequency,
    avg duration, avg mean, Σ mean×duration — checked by hand."""
    from outage_data_scraper_spark.operators.sessionize import merger_monthly_property

    merged = spark.createDataFrame(
        pd.DataFrame(
            [
                ("u1", pd.Timestamp("2024-01-05"), pd.Timestamp("2024-01-06"), 10.0, 3600),
                ("u1", pd.Timestamp("2024-01-20"), pd.Timestamp("2024-01-21"), 20.0, 7200),
                ("u1", pd.Timestamp("2024-02-02"), pd.Timestamp("2024-02-03"), 99.0, 60),
                ("u2", pd.Timestamp("2024-01-10"), pd.Timestamp("2024-01-11"), 5.0, 600),
            ],
            columns=["UtilityName", "start_time", "end_time", "customer_affected_mean", "duration_s"],
        )
    )
    rep = {
        r.UtilityName: r
        for r in merger_monthly_property(
            merged, "2024-01-01 00:00:00", "2024-02-01 00:00:00"
        ).collect()
    }
    u1 = rep["u1"]
    assert u1.frequency == 2
    assert u1.avg_duration_min == pytest.approx((60 + 120) / 2)
    assert u1.avg_customer_affected_mean == pytest.approx(15.0)
    assert u1.total_customer_affected_x_duration == pytest.approx(10 * 60 + 20 * 120)
    assert rep["u2"].frequency == 1


def test_hypothesis_segment_parity_operator_vs_port():
    """Property fuzz of the two independent merger implementations at the
    segment level (pure Python — no Spark session): any bounded series of
    readings must produce identical closed outages under both, across a
    grid of (threshold, abs_diff) settings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from outage_data_scraper_spark.operators.sessionize import _merge_segment

    @settings(max_examples=300, deadline=None)
    @given(
        outs=st.lists(st.integers(min_value=0, max_value=800), min_size=1, max_size=60),
        threshold=st.sampled_from([0.0, 0.1, 0.25, 0.5]),
        abs_diff=st.sampled_from([0.0, 5.0, 25.0, 120.0]),
    )
    def check(outs, threshold, abs_diff):
        seconds = [(TS0 + pd.Timedelta(minutes=15 * i)) for i in range(len(outs))]
        int_rows = [
            (int(t.value // 10**9), o) for t, o in zip(seconds, outs)
        ]
        got = sorted(
            (s, e, round(m, 9), d)
            for s, e, m, d in _merge_segment(int_rows, threshold, abs_diff)
            if d > 0
        )
        want = sorted(
            (int(s.value // 10**9), int(e.value // 10**9), round(m, 9), d)
            for s, e, m, d in _port_merger(
                list(zip(seconds, outs)), threshold, abs_diff
            )
        )
        assert got == want

    check()


def test_multiple_groups_fold_independently(spark):
    pdf = pd.DataFrame(
        [
            (u, "ga", "c", "ci", "0", 1000, out, TS0 + pd.Timedelta(minutes=15 * i))
            for u in ("u1", "u2")
            for i, out in enumerate([100, 200, 100, 100])
        ],
        columns=[
            "UtilityName", "StateName", "CountyName", "CityName",
            "CountyFIPS", "CustomersTracked", "CustomersOut", "RecordDateTime",
        ],
    )
    got = threshold_merger(spark.createDataFrame(pdf), threshold=0.1, abs_diff=0.0)
    counts = got.groupBy("UtilityName").count().collect()
    assert {r.UtilityName: r["count"] for r in counts} == {"u1": 2, "u2": 2}
