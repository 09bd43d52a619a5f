"""Generate the committed q79 expected parquet (BPE-encoded doc stats).

Applying a learned merge list is as iterative as learning it, so q79's
oracle rows are stamped by the Python twins (train_bpe_py +
encode_words_py over the same normalization) against the sf0.01
documents table. Input-digest guarded like q67/q68.

Run from the repo root: python scripts/gen_q79_oracle.py
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from outage_data_scraper_spark.operators.bpe import encode_words_py, train_bpe_py

DOCS = "/root/testdata/sf0.01/documents.parquet"
N_MERGES = 30  # matches q68/q79


def _words(t: str) -> list[str]:
    return [
        w
        for w in re.sub(r"\s+", " ", t, flags=re.ASCII).strip().lower().split(" ")
        if w
    ]


def main() -> None:
    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    doc_ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    merges = [(m[1], m[2]) for m in train_bpe_py(texts, N_MERGES)]
    vocab = sorted({w for t in texts if t for w in _words(t)})
    enc = encode_words_py(vocab, merges)
    out = {"doc_id": [], "n_words": [], "n_bpe_tokens": []}
    for d, t in zip(doc_ids, texts):
        ws = _words(t) if t else []
        out["doc_id"].append(d)
        out["n_words"].append(len(ws))
        out["n_bpe_tokens"].append(sum(len(enc[w]) for w in ws))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testoracle"
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "n_words": pa.array(out["n_words"], pa.int64()),
                "n_bpe_tokens": pa.array(out["n_bpe_tokens"], pa.int64()),
            }
        ),
        os.path.join(out_dir, "q79_expected.parquet"),
    )
    with open(DOCS, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    with open(os.path.join(out_dir, "q79_meta.json"), "w") as f:
        json.dump({"documents_md5": digest}, f)
    print(f"wrote testoracle/q79_expected.parquet: {len(doc_ids)} rows, "
          f"documents_md5={digest}")


if __name__ == "__main__":
    main()
