"""PII detection and redaction over a document corpus.

The standard pre-training hygiene pass (CCNet/Dolma ship the same
shapes): find emails / IPv4 addresses / US phone numbers / SSN-shaped
ids, count them per document, and rewrite the text with typed
placeholder tokens. The reference repo has no analog — this is part of
the training-data-pipeline surface the task adds on top of the
reference's operator inventory.

Scale shape: pure column algebra — ``regexp_extract_all`` /
``regexp_replace`` are JVM-side, codegen'd, and narrow (zero shuffles:
the whole pass is a projection over the corpus scan, so at 100 TB it
runs at scan speed and pipelines into whatever filter/dedup stage
follows). No Python in the hot path.

Cross-engine regex discipline: every pattern below is written in the
common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, non-capturing groups, and ASCII ``\\b``
word boundaries only. No lookaround (RE2 has none), no backrefs, no
replacement-string metacharacters (`$`/`\\` are special in one engine
each — placeholder tokens are plain text). DuckDB's
``regexp_replace`` needs the explicit ``'g'`` flag to replace every
match; Spark's always does. Counting runs on the ORIGINAL text per
category (order-independent); scrubbing applies sequentially
email → ssn → phone → ip, and no replacement token introduces digits
or ``@``, so earlier redactions cannot create later matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for scrubbing (see module docstring); counting is
# per-pattern on the original text so it is order-free.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

#: (column-suffix, pattern, placeholder) in scrub order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ssns", SSN_RE, "<SSN>"),
    ("phones", PHONE_RE, "<PHONE>"),
    ("ipv4s", IPV4_RE, "<IP>"),
]


def pii_count(text_col: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in the text
    (0 for null text — ``size`` returns -1 on null, hence the coalesce
    on the input, not the output)."""
    return F.size(F.regexp_extract_all(F.coalesce(text_col, F.lit("")), F.lit(pattern), F.lit(0)))


def pii_scrub(text_col: Column) -> Column:
    """Text with every PII span replaced by its typed placeholder,
    applied in PII_PATTERNS order. Null-preserving (a null document
    stays null rather than becoming an empty string)."""
    out = text_col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_report(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII audit: one count column per category, the total,
    and the md5 of the scrubbed text (the value the cleaning pipeline
    actually ships; md5 because it is the only hash both engines share —
    CLAUDE.md invariant). Pure projection — zero shuffles at any scale.
    """
    text = F.col(text_col)
    counts = {
        f"n_{name}": pii_count(text, pattern) for name, pattern, _ in PII_PATTERNS
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col),
        *[v.alias(k) for k, v in counts.items()],
        total.alias("n_pii"),
        F.md5(pii_scrub(text)).alias("scrubbed_md5"),
    )
