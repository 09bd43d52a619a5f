"""Generate the committed q67 expected parquet (compression signal).

DuckDB has no zlib, so the q67 oracle is stamped by plain-Python zlib
(the exact compressed_len_py the engine's Pandas UDF uses) over the
sf0.01 documents table, with integer ratio_bp arithmetic mirroring
operators/compress.py. A digest of the input file is recorded so
oracle_sql() degrades q67 to rows-only (instead of failing against
stale expectations) if the driver ever regenerates testdata — rerun
this script to re-stamp.

Run from the repo root: python scripts/gen_q67_oracle.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from outage_data_scraper_spark.operators.compress import compressed_len_py

DOCS = "/root/testdata/sf0.01/documents.parquet"


def main() -> None:
    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    doc_ids, raw_lens, comp_lens, ratios = [], [], [], []
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        t = "" if text is None else text
        raw = len(t.encode("utf-8"))
        comp = compressed_len_py(text)
        doc_ids.append(doc_id)
        raw_lens.append(raw)
        comp_lens.append(comp)
        ratios.append(comp * 10000 // raw if raw > 0 else None)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testoracle"
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "raw_len": pa.array(raw_lens, pa.int64()),
                "comp_len": pa.array(comp_lens, pa.int64()),
                "ratio_bp": pa.array(ratios, pa.int64()),
            }
        ),
        os.path.join(out_dir, "q67_expected.parquet"),
    )
    with open(DOCS, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    with open(os.path.join(out_dir, "q67_meta.json"), "w") as f:
        json.dump({"documents_md5": digest}, f)
    print(f"wrote testoracle/q67_expected.parquet: {len(doc_ids)} rows, "
          f"documents_md5={digest}")


if __name__ == "__main__":
    main()
