"""Site-family payload parsers (SURVEY.md §2.2) as pure batch functions.

Each parser takes one payload's bytes and returns
``(levels: dict[level → list[record-dict]], children: list[url])``.
They run inside Arrow-batched ``mapInPandas`` (parsers/parse.py), never as
row-at-a-time Python UDFs at the Spark plan level.

Semantics mirror the reference parsers exactly — including the
stringly-typed zero comparisons that differ between HTML-table families
(`!= "0"`) and JSON families (`!= 0`), which SURVEY.md §1.2 flags as
load-bearing. Citations per family below.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

from .html_table import extract_tables, table_records

Levels = dict[str, list[dict]]
ParseOut = tuple[Levels, list[str]]

ZIP_GUARD_SENTINEL = "Outage scale too large to extract zipcodes"


def _ms_to_str(ms: int) -> str:
    """Epoch-ms → 'YYYY-MM-DD HH:MM:SS' UTC (reference pd.to_datetime(unit='ms')
    string form; ga_scraper.py:449–451, tx_scraper.py:95–97)."""
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


# -- GA1: two JSON endpoints (ga_scraper.py:205–266) ------------------------

def parse_ga1_boundaries(payload: bytes) -> ParseOut:
    items = json.loads(payload)
    flat = [b for item in items for b in item["boundaries"]]
    rows = [
        b for b in flat if b["customersAffected"] != 0 or b["customersOutNow"] != 0
    ]
    return {"per_county": rows}, []


def parse_ga1_outages(payload: bytes) -> ParseOut:
    outs = json.loads(payload)
    # <10-row zip guard (ga_scraper.py:240–249): keep payload zip as the
    # geocode stand-in below the guard, sentinel above it.
    if len(outs) >= 10:
        for o in outs:
            o["zip"] = ZIP_GUARD_SENTINEL
    return {"per_outage": outs}, []


# -- GA3: XML ASMX (ga_scraper.py:330–348) ----------------------------------

def parse_ga3(payload: bytes) -> ParseOut:
    root = ET.fromstring(payload.decode())
    counties = []
    for mc in root.iter("MobileCounty"):
        rec = {c.tag: (c.text or "") for c in mc}
        rec.pop("Shape", None)  # dropped by reference (ga_scraper.py:316)
        if rec.get("CustomersAffected") != "0":  # string-typed compare
            counties.append(rec)
    outages = [
        {c.tag: (c.text or "") for c in mo} for mo in root.iter("MobileOutage")
    ]
    return {"per_county": counties, "per_outage": outages}, []


# -- kubra: anchor page + report JSONs (ga_scraper.py:351–436) ---------------

_REPORT_LINK = re.compile(r'<a class="report-link" href="([^"]+)"')

# Keyword cascade, order-sensitive (O15; ga_scraper.py:417–434).
_LEVEL_KEYWORDS = [
    ("zip", "per_zipcode"),
    ("county", "per_county"),
    ("city", "per_city"),
    ("town", "per_town"),
    ("ward", "per_ward"),
    ("media", "per_media"),
]


def classify_level(title: str) -> str:
    low = title.lower()
    for kw, level in _LEVEL_KEYWORDS:
        if kw in low:
            return level
    return "per_unknown"


def parse_kubra_anchor(payload: bytes) -> ParseOut:
    # children in discovery order, visited-deduped (il_scraper.py:200–204)
    seen: set[str] = set()
    children = []
    for href in _REPORT_LINK.findall(payload.decode()):
        if href not in seen:
            seen.add(href)
            children.append(href)
    return {}, children


def parse_kubra_report(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    level = classify_level(doc.get("file_title", ""))
    rows = []
    for a in doc["file_data"]["areas"]:
        rec = {
            "name": a["name"],
            "cust_a": a["cust_a"]["val"],  # {val:…} unwrap (ga_scraper.py:362–364)
            "percent_cust_a": a["percent_cust_a"]["val"],
            "n_out": a["n_out"],
        }
        if rec["cust_a"] != 0 or rec["n_out"] != 0:
            rows.append(rec)
    return {level: rows}, []


# -- GA9: HTML tables (ga_scraper.py:597–689) --------------------------------

def parse_ga9(payload: bytes) -> ParseOut:
    tables = extract_tables(payload.decode())
    if len(tables) < 2:
        return {}, []
    recs = table_records(tables[1])
    rows = [r for r in recs if r.get("# Out") != "0"]  # string-typed compare
    return {"per_zone": rows}, []


# -- TX4: flat JSON lists with ms epochs (tx_scraper.py:85–114) ---------------

def parse_tx4(payload: bytes, level: str = "per_county") -> ParseOut:
    items = json.loads(payload)
    rows = []
    for it in items:
        if it["customersAffected"] != 0:
            rec = dict(it)
            rec["lastUpdatedTime"] = _ms_to_str(rec["lastUpdatedTime"])
            rows.append(rec)
    return {level: rows}, []


# -- TN7: outage details (tn_scraper.py:175–227) ------------------------------
# The per_county / per_zipcode rollups the reference computes with
# pandas groupby-sum (tn_scraper.py:190–200) are done engine-side as a
# DataFrame groupBy (operators/rollup.py, O17) — parser emits per_outage.

def parse_tn7(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    return {"per_outage": doc["electricOutageDetails"]}, []


# -- FL13: regionDataSets (fl_scraper.py:488–518) ------------------------------

def parse_fl13(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    levels: Levels = {}
    for ds in doc["regionDataSets"]:
        rows = [r for r in ds["regions"] if r["numberOut"] != 0]
        levels[f"per_{ds['id']}"] = rows
    return levels, []


# -- CA investor: ArcGIS features (ca_scraper.py:14–63) -----------------------

def parse_ca_inv(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = []
    for f in doc["features"]:
        rec = dict(f["attributes"])
        rec["x"] = f["geometry"]["x"]
        rec["y"] = f["geometry"]["y"]
        rec["StartDate"] = _ms_to_str(rec["StartDate"])
        rec["EstimatedRestoreDate"] = _ms_to_str(rec["EstimatedRestoreDate"])
        rows.append(rec)
    return {"per_outage": rows}, []


# -- cc: Common-Crawl-style page (bench family) --------------------------------

_TAG_STRIP = re.compile(r"<script.*?</script>|<style.*?</style>|<[^>]+>", re.S)
_WS = re.compile(r"\s+")


def parse_cc(payload: bytes):
    """Boilerplate-stripped text extraction from a web page: drop
    script/style, strip tags, collapse whitespace. Returns a 3-tuple —
    the third element IS the page text (the byte-identical-per-url
    invariant), so it is never duplicated into the record JSON."""
    raw = payload.decode("utf-8", errors="replace")
    text = _WS.sub(" ", _TAG_STRIP.sub(" ", raw)).strip()
    rec = {
        "n_tokens": text.count(" ") + 1 if text else 0,
        "n_chars": len(text),
    }
    return {"per_page": [rec]}, [], text


PARSERS: dict[str, callable] = {
    "ga1_boundaries": parse_ga1_boundaries,
    "ga1_outages": parse_ga1_outages,
    "ga3": parse_ga3,
    "kubra_anchor": parse_kubra_anchor,
    "kubra_report": parse_kubra_report,
    "ga9": parse_ga9,
    "tx4": parse_tx4,
    "tn7": parse_tn7,
    "fl13": parse_fl13,
    "ca_inv": parse_ca_inv,
    "cc": parse_cc,
}


def parse_payload(kind: str, payload: bytes) -> tuple[Levels, list[str], str | None]:
    """Normalized parser call: (levels, children, explicit_text|None).
    Parsers returning 2-tuples get their text derived via canonical_text
    by the parse stage; a 3-tuple parser supplies the page text itself."""
    out = PARSERS[kind](payload)
    if len(out) == 2:
        levels, children = out
        return levels, children, None
    return out


def canonical_text(levels: Levels) -> str:
    """The byte-identical extracted-text invariant target per URL: compact
    canonical JSON of the parsed record levels (insertion-ordered keys,
    deterministic by construction)."""
    return json.dumps(levels, separators=(",", ":"), ensure_ascii=False)
