"""Generate the committed q28 expected-signature parquet.

Builds the same 200 synthetic assets as q28's synth_assets(spark, 200)
(asset_payload is the shared generator), runs each payload through the
SAME real-decode feature path (payload_features) and stamps the
canonical feature signature (feature_signature) into
testoracle/q28_expected.parquet. The driver's oracle SQL SELECTs this
file while Spark recomputes through decode_ppm/decode_png/decode_wav —
any pixel/sample-level decode drift breaks the value hash.

Run from the repo root: python scripts/gen_q28_oracle.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from outage_data_scraper_spark.operators.multimodal import (
    ASSET_KINDS,
    asset_payload,
    feature_signature,
    payload_features,
)

N, DIM = 200, 16


def main() -> None:
    rows = {"asset_id": [], "kind": [], "decoder": [], "feat_sig": []}
    for i in range(N):
        kind = ASSET_KINDS[i % 3]
        feat, decoder = payload_features(asset_payload(i, kind), DIM)
        rows["asset_id"].append(i)
        rows["kind"].append(kind)
        rows["decoder"].append(decoder)
        rows["feat_sig"].append(feature_signature(feat))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testoracle", "q28_expected.parquet",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    table = pa.table(
        {
            "asset_id": pa.array(rows["asset_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "decoder": pa.array(rows["decoder"], pa.string()),
            "feat_sig": pa.array(rows["feat_sig"], pa.string()),
        }
    )
    pq.write_table(table, out)
    from collections import Counter

    print(f"wrote {out}: {table.num_rows} rows, "
          f"decoders={dict(Counter(rows['decoder']))}")


if __name__ == "__main__":
    main()
