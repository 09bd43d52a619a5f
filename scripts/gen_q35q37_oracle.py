"""Generate committed expected outputs for q35/q37 from the REFERENCE code.

The threshold merger's case-D list mutation is not ANSI-SQL, so q35/q37
were rows-only in the driver gate. This script closes that: it execs the
reference's step1_threshold.py AS A WHOLE (argparse, pd.read_csv and
DataFrame.to_csv stubbed) over the exact q35 input projection of
/root/testdata/sf0.01/events.parquet, and the reference's
step2_grower_property.py per utility over step1's result, then stamps
the outputs — shaped and rounded exactly like q35/q37's Spark results —
into testoracle/q35_expected.parquet and q37_expected.parquet. The
driver's oracle SQL SELECTs these files, so the Spark merger is now
VALUE-gated against the reference implementation itself (the same
ground truth tests/test_reference_merger_oracle.py uses, materialized
for the driver).

Rounding parity: Spark F.round is HALF_UP BigDecimal-on-double; Python's
decimal.Decimal(float) takes the same exact binary value, so
Decimal(x).quantize(..., ROUND_HALF_UP) reproduces it bit-for-bit.

Run from the repo root: python scripts/gen_q35q37_oracle.py
"""

from __future__ import annotations

import argparse
import contextlib
import io
import math
import os
import pathlib
import sys
import types
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REF1 = pathlib.Path("/root/reference/scripts/bluefire/step1_threshold.py")
REF2 = pathlib.Path("/root/reference/scripts/bluefire/step2_grower_property.py")
EVENTS = "/root/testdata/sf0.01/events.parquet"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testoracle"
)
THRESHOLD, ABS_DIFF = "0.1", "5.0"


def _round_half_up(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


@contextlib.contextmanager
def _stubbed(parse_args_ns, read_csv_frame):
    real_parser, real_read = argparse.ArgumentParser, pd.read_csv
    real_tocsv = pd.DataFrame.to_csv

    class _P:
        def add_argument(self, *a, **k):
            pass

        def parse_args(self):
            return parse_args_ns

    argparse.ArgumentParser = lambda *a, **k: _P()
    pd.read_csv = lambda *a, **k: read_csv_frame.copy()
    pd.DataFrame.to_csv = lambda *a, **k: None
    try:
        yield
    finally:
        argparse.ArgumentParser = real_parser
        pd.read_csv = real_read
        pd.DataFrame.to_csv = real_tocsv


def _exec_script(path: pathlib.Path, ns_args, frame) -> dict:
    import logging

    ns: dict = {}
    logging.disable(logging.CRITICAL)  # case D-1/D-2 chatter on root logger
    try:
        with _stubbed(ns_args, frame), contextlib.redirect_stdout(io.StringIO()):
            exec(compile(path.read_text(), str(path), "exec"), ns)
    finally:
        logging.disable(logging.NOTSET)
    return ns


def q35_input() -> pd.DataFrame:
    """The exact q35 projection of the events table (__spark_entry__.py
    q35_threshold_merger): UtilityName=str(user_id), constants, floored
    CustomersOut, second-truncated RecordDateTime."""
    ev = pq.read_table(EVENTS, columns=["user_id", "ts", "value"]).to_pandas()
    return pd.DataFrame(
        {
            "UtilityName": ev["user_id"].astype("int64").astype(str),
            "StateName": "tx",
            "CountyName": "c",
            "CityName": "ci",
            "CountyFIPS": "0",
            "CustomersTracked": 1000,
            "CustomersOut": ev["value"].map(math.floor).astype("int64"),
            "RecordDateTime": pd.to_datetime(ev["ts"]).dt.floor("s"),
        }
    )


def main() -> None:
    frame = q35_input()
    ns1 = _exec_script(
        REF1,
        types.SimpleNamespace(
            loglevel="warning", filename="x", threshold=THRESHOLD, abs_diff=ABS_DIFF
        ),
        frame,
    )
    result_df = ns1["result_df"]

    # q35 shape: (utility, start_ts, end_ts, customer_affected_mean r4,
    # duration_s)
    q35 = pa.table(
        {
            "utility": pa.array(
                [str(u) for u in result_df["UtilityName"]], pa.string()
            ),
            "start_ts": pa.array(
                [t.strftime("%Y-%m-%d %H:%M:%S") for t in result_df["start_time"]],
                pa.string(),
            ),
            "end_ts": pa.array(
                [t.strftime("%Y-%m-%d %H:%M:%S") for t in result_df["end_time"]],
                pa.string(),
            ),
            "customer_affected_mean": pa.array(
                [
                    _round_half_up(float(m), 4)
                    for m in result_df["customer_affected_mean"]
                ],
                pa.float64(),
            ),
            "duration_s": pa.array(
                [int(d.total_seconds()) for d in result_df["duration"]], pa.int64()
            ),
        }
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(q35, os.path.join(OUT_DIR, "q35_expected.parquet"))

    # q37: the reference step2 per utility over step1's result, January
    # 2024 window, q37's shape/rounding
    rows = {
        "utility": [],
        "frequency": [],
        "avg_duration_min": [],
        "avg_customer_affected_mean": [],
        "total_customer_affected_x_duration": [],
    }
    for util, grp in result_df.groupby("UtilityName", sort=False):
        step2_in = pd.DataFrame(
            {
                "start_time": [
                    t.strftime("%Y-%m-%d %H:%M:%S") for t in grp["start_time"]
                ],
                "duration": [d.total_seconds() / 60.0 for d in grp["duration"]],
                "customer_affected_mean": [
                    float(m) for m in grp["customer_affected_mean"]
                ],
            }
        )
        ns2 = _exec_script(
            REF2,
            types.SimpleNamespace(filename="x", month="1", year="2024",
                                  next_month="xxx"),
            step2_in,
        )
        freq = int(ns2["frequency"])
        if freq == 0:
            continue  # engine groupBy emits no row for an empty window
        rows["utility"].append(str(util))
        rows["frequency"].append(freq)
        rows["avg_duration_min"].append(
            _round_half_up(ns2["total_duration"] / freq, 4)
        )
        rows["avg_customer_affected_mean"].append(
            _round_half_up(ns2["total_customer_affected_mean"] / freq, 4)
        )
        rows["total_customer_affected_x_duration"].append(
            _round_half_up(ns2["total_customer_affected_mean_duration"], 2)
        )
    q37 = pa.table(
        {
            "utility": pa.array(rows["utility"], pa.string()),
            "frequency": pa.array(rows["frequency"], pa.int64()),
            "avg_duration_min": pa.array(rows["avg_duration_min"], pa.float64()),
            "avg_customer_affected_mean": pa.array(
                rows["avg_customer_affected_mean"], pa.float64()
            ),
            "total_customer_affected_x_duration": pa.array(
                rows["total_customer_affected_x_duration"], pa.float64()
            ),
        }
    )
    pq.write_table(q37, os.path.join(OUT_DIR, "q37_expected.parquet"))
    # stamp the input digest: __spark_entry__._merger_reference_oracles
    # omits these oracles (rows-only fallback) if the events table ever
    # changes, instead of failing against stale expectations
    import hashlib
    import json

    with open(EVENTS, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    with open(os.path.join(OUT_DIR, "q35_meta.json"), "w") as f:
        json.dump({"events_md5": digest}, f)
    print(f"q35_expected: {q35.num_rows} rows; q37_expected: {q37.num_rows} rows; "
          f"events_md5={digest}")


if __name__ == "__main__":
    main()
