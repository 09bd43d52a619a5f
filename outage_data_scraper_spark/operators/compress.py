"""zlib compression-ratio quality signal over a document corpus.

The classic "too repetitive / too random" detector training-data
pipelines (Dolma, Gopher reproductions) compute per document: text that
compresses extremely well is boilerplate or spam; text that barely
compresses is binary junk or encrypted noise. The reference repo has no
analog — this extends the training-data-pipeline surface.

Scale shape: one Arrow-batched Pandas UDF (zlib is C-speed; the batch
transfer is the only Python cost) inside a pure projection — zero
shuffles, so at 100 TB the pass runs at scan speed. Everything around
the UDF is JVM-side (octet_length, integer DIV).

Determinism: zlib level 6 with default strategy is bit-stable for a
given zlib build, and only the compressed LENGTH is kept, making the
signal integer-exact: the gated columns are (raw_len, comp_len,
ratio_bp) where ratio_bp = comp_len * 10000 DIV raw_len — integer
arithmetic both engines compute identically, immune to float rounding
(CLAUDE.md invariant). The oracle is a committed parquet stamped by
plain-Python zlib over the same input (scripts/gen_q67_oracle.py) with
an input-digest guard, because DuckDB has no zlib.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

#: fixed level so the committed oracle and the engine can never drift
ZLIB_LEVEL = 6


def compressed_len_py(text: str | None) -> int:
    """Driver/oracle-side twin of the UDF: compressed byte length of the
    UTF-8 encoding (null → empty string, matching the column path)."""
    return len(zlib.compress(("" if text is None else text).encode("utf-8"), ZLIB_LEVEL))


# a DataType object, not a DDL string: string return types are parsed
# through the active SparkContext, which breaks importing this module
# (e.g. from the oracle generator) before any session exists
@pandas_udf(LongType())
def _zlib_len(texts: pd.Series) -> pd.Series:
    return texts.map(compressed_len_py)


def compression_signal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document (raw_len, comp_len, ratio_bp): UTF-8 byte length,
    zlib-6 compressed length, and the ratio in basis points via integer
    DIV (null for empty docs — no divide-by-zero, no float)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    sized = docs.select(
        F.col(id_col),
        F.octet_length(text).alias("raw_len"),
        _zlib_len(text).alias("comp_len"),
    )
    return sized.select(
        id_col,
        "raw_len",
        "comp_len",
        F.when(
            F.col("raw_len") > 0, F.expr("comp_len * 10000 DIV raw_len")
        ).alias("ratio_bp"),
    )
