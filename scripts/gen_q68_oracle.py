"""Generate the committed q68 expected parquet (BPE merge table).

An iterative argmax loop is not ANSI SQL, so q68's oracle rows are
stamped by train_bpe_py — the exact driver-side twin of the Spark
trainer (same normalization, pair counting, tiebreak, and merge fold;
operators/bpe.py) — over the sf0.01 documents table. Input-digest
guarded like q35/q37/q67: regenerated testdata degrades q68 to
rows-only; rerun this script to re-stamp.

Run from the repo root: python scripts/gen_q68_oracle.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from outage_data_scraper_spark.operators.bpe import train_bpe_py

DOCS = "/root/testdata/sf0.01/documents.parquet"
N_MERGES = 30  # must match q68's n_merges


def main() -> None:
    texts = pq.read_table(DOCS, columns=["text"])["text"].to_pylist()
    merges = train_bpe_py(texts, N_MERGES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testoracle"
    )
    pq.write_table(
        pa.table(
            {
                "step": pa.array([m[0] for m in merges], pa.int32()),
                "left": pa.array([m[1] for m in merges], pa.string()),
                "right": pa.array([m[2] for m in merges], pa.string()),
                "merged": pa.array([m[3] for m in merges], pa.string()),
                "pair_freq": pa.array([m[4] for m in merges], pa.int64()),
            }
        ),
        os.path.join(out_dir, "q68_expected.parquet"),
    )
    with open(DOCS, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    with open(os.path.join(out_dir, "q68_meta.json"), "w") as f:
        json.dump({"documents_md5": digest}, f)
    print(f"wrote testoracle/q68_expected.parquet: {len(merges)} merges, "
          f"first={merges[:3]}, documents_md5={digest}")


if __name__ == "__main__":
    main()
