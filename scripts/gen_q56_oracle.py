"""Generate the committed q56 expected-pages parquet.

Parses the SAME deterministic WARC corpus as q56 (warc.synth_warc_corpus
→ warc.warc_blob_to_rows, pure Python — no Spark) and stamps
testoracle/q56_expected.parquet with one row per response page: url,
warc_ts, http_status, mime, n_chars and the md5 of the extracted text.
The driver's oracle SQL SELECTs this file while Spark recomputes
through binaryFile → member-wise gunzip → record walk → parse_cc — any
drift in framing, resync, HTTP parsing or text extraction breaks the
value hash (including the pinned corrupt-member drop: exactly 60 rows).

Regenerate ONLY when the WARC parse or corpus changes intentionally:
python scripts/gen_q56_oracle.py  (from the repo root)
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from outage_data_scraper_spark.sources.warc import synth_warc_corpus, warc_blob_to_rows


def main() -> None:
    cols = {"url": [], "warc_ts": [], "http_status": [], "mime": [],
            "n_chars": [], "text_sig": [], "warc_name": []}
    for name, blob in synth_warc_corpus():
        for r in warc_blob_to_rows(blob, name):
            cols["url"].append(r["url"])
            cols["warc_ts"].append(r["warc_ts"])
            cols["http_status"].append(r["http_status"])
            cols["mime"].append(r["mime"])
            cols["n_chars"].append(len(r["text"]))
            cols["text_sig"].append(hashlib.md5(r["text"].encode()).hexdigest())
            cols["warc_name"].append(name)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testoracle", "q56_expected.parquet",
    )
    table = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "http_status": pa.array(cols["http_status"], pa.int32()),
            "mime": pa.array(cols["mime"], pa.string()),
            "n_chars": pa.array(cols["n_chars"], pa.int64()),
            "text_sig": pa.array(cols["text_sig"], pa.string()),
            "warc_name": pa.array(cols["warc_name"], pa.string()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
