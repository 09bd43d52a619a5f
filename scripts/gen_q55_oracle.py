"""Generate the committed q55 expected per-frame-signature parquet.

Mirrors scripts/gen_q28_oracle.py: builds the same 200 synthetic assets
as q55's synth_assets(spark, 200) via the shared asset_payload
generator, decodes every video container with the SAME code path
(decode_avi_mjpeg → _mean_pool_features → feature_signature) at the
query's sampling stride, and stamps testoracle/q55_expected.parquet.
The driver's oracle SQL SELECTs this file while Spark recomputes
through the real AVI walk + per-frame JPEG decode — any pixel-level
drift breaks the value hash.

Regenerate ONLY when the decode path changes intentionally:
python scripts/gen_q55_oracle.py  (from the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from outage_data_scraper_spark.operators.jpeg import decode_avi_mjpeg
from outage_data_scraper_spark.operators.multimodal import (
    ASSET_KINDS,
    _mean_pool_features,
    asset_payload,
    feature_signature,
)

N, EVERY, DIM = 200, 2, 8


def main() -> None:
    rows = {"asset_id": [], "frame_idx": [], "n_frames": [], "fps": [], "frame_sig": []}
    for i in range(N):
        if ASSET_KINDS[i % 3] != "video":
            continue
        frames, fps = decode_avi_mjpeg(asset_payload(i, "video"))
        for idx in range(0, len(frames), EVERY):
            rows["asset_id"].append(i)
            rows["frame_idx"].append(idx)
            rows["n_frames"].append(len(frames))
            rows["fps"].append(fps)
            rows["frame_sig"].append(
                feature_signature(_mean_pool_features(frames[idx], DIM))
            )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testoracle", "q55_expected.parquet",
    )
    table = pa.table(
        {
            "asset_id": pa.array(rows["asset_id"], pa.int64()),
            "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "fps": pa.array(rows["fps"], pa.int32()),
            "frame_sig": pa.array(rows["frame_sig"], pa.string()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
