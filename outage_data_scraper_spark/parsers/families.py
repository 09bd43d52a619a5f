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
from html.parser import HTMLParser

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


# -- TX5: kubra-variant report flow (tx_scraper.py:117–228; SC Dominion
# twin via sc_scraper.py:50–51). Same anchor → report-link discovery as
# kubra, but the report parse keeps EVERY area column (dropping only
# gotoMap), unwraps the {val:…} dicts, filters `cust_a != 0 or n_out != 0`
# (ints after unwrap — a REAL filter here, unlike the DOM-string families),
# and routes the record level by ORDER-SENSITIVE keyword probes over the
# raw payload text (zip/Zip → county → city/Cities → region/Region,
# tx_scraper.py:216–224); an unmatched report is dropped entirely.

_TX5_LEVELS = [
    ("per_zipcode", ("zip", "Zip")),
    ("per_county", ("county",)),
    ("per_city", ("city", "Cities")),
    ("per_region", ("region", "Region")),
]


def parse_tx5_report(payload: bytes) -> ParseOut:
    text = payload.decode()
    level = None
    for lvl, kws in _TX5_LEVELS:
        if any(k in text for k in kws):
            level = lvl
            break
    if level is None:
        return {}, []
    doc = json.loads(text)
    rows = []
    for a in doc["file_data"]["areas"]:
        rec = {k: v for k, v in a.items() if k != "gotoMap"}
        for k in ("cust_a", "percent_cust_a"):
            if isinstance(rec.get(k), dict):
                rec[k] = rec[k].get("val")
        if rec.get("cust_a") != 0 or rec.get("n_out") != 0:
            rows.append(rec)
    return {level: rows}, []


# -- GA9: landing page discovers dropdown levels; one table per level
# (ga_scraper.py:597–689, dropdown discovery at 680–688) -----------------------

_GA9_OPTION = re.compile(r'<option value="([^"]+)"')


def parse_ga9_landing(payload: bytes, url: str = "") -> ParseOut:
    """The runtime-discovered dropdown levels become child URLs — the
    engine form of the reference's per-dropdown page loads."""
    levels = _GA9_OPTION.findall(payload.decode())
    children = [f"{url}?level={lv}" for lv in levels]
    return {}, children


def parse_ga9_table(payload: bytes, url: str = "") -> ParseOut:
    tables = extract_tables(payload.decode())
    if len(tables) < 2:
        return {}, []
    recs = table_records(tables[1])
    rows = [r for r in recs if r.get("# Out") != "0"]  # string-typed compare
    level = url.rsplit("level=", 1)[-1] if "level=" in url else "zone"
    return {f"per_{level}": rows}, []


# -- TX4: flat JSON lists at …zip / …county endpoints (tx_scraper.py:85–114) ---

def parse_tx4(payload: bytes, url: str = "") -> ParseOut:
    items = json.loads(payload)
    rows = []
    for it in items:
        if it["customersAffected"] != 0:
            rec = dict(it)
            rec["lastUpdatedTime"] = _ms_to_str(rec["lastUpdatedTime"])
            rows.append(rec)
    level = "per_zipcode" if url.endswith("zip") else "per_county"
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


# -- GA2: Outages with OutageLocation X/Y (ga_scraper.py:269–297) --------------

def parse_ga2(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = []
    for o in doc["Outages"]:
        rec = dict(o)
        loc = rec.pop("OutageLocation")
        rec["X"] = loc["X"]
        rec["Y"] = loc["Y"]
        rows.append(rec)
    return {"per_outage": rows}, []


# -- GA5: flat list, ms epochs, zip guard (ga_scraper.py:439–479) ---------------

def parse_ga5(payload: bytes) -> ParseOut:
    items = json.loads(payload)
    rows = []
    for it in items:
        rec = dict(it)
        rec["startTime"] = _ms_to_str(rec["startTime"])
        rec["lastUpdatedTime"] = _ms_to_str(rec["lastUpdatedTime"])
        rows.append(rec)
    # <10-row zip guard (ga_scraper.py:455–463)
    if len(rows) >= 10:
        for r in rows:
            r["zip"] = ZIP_GUARD_SENTINEL
    else:
        for r in rows:
            r["zip"] = f"{30000 + int(abs(r['lat'] * 100)) % 9999:05d}"  # geocode stand-in
    return {"per_outage": rows}, []


# -- GA6: reportData polygons + outageData (ga_scraper.py:482–510) ---------------

def parse_ga6(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    polys = [p for p in doc["reportData"]["polygons"] if p["affected"] > 0]
    outs = doc["outageData"]["outages"]
    return {"per_county": polys, "per_outage": outs}, []


# -- GA7: ShellOut markers (ga_scraper.py:513–589) --------------------------------

def parse_ga7(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = []
    for m in doc["markers"]:
        rec = dict(m)
        rec["service_index_name"] = doc["service_index_name"]
        rec["isHighTraffic"] = doc["isHighTraffic"]
        rows.append(rec)
    return {"per_outage": rows}, []


# -- GA10: attributes → lowercased cols, string zeros (ga_scraper.py:692–741) ----

def parse_ga10(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = []
    for f in doc["features"]:
        rec = {k.lower(): v for k, v in f["attributes"].items()}  # case-fold (O11)
        if rec.get("members affected") != "0":  # string-typed compare
            rows.append(rec)
    return {"per_county": rows}, []


# -- GA11: three endpoints (ga_scraper.py:744–850) --------------------------------

def parse_ga11_subs(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = [s for s in doc["rows"]["subs"] if s["SubTotalConsumersOut"] != 0]
    return {"per_substation": rows}, []


def parse_ga11_county(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = [r for r in doc["rows"] if r["out"] != 0]
    return {"per_county": rows}, []


def parse_ga11_outages(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = []
    for key, val in doc.items():
        if not isinstance(val, dict) or "markers" not in val:
            continue
        for m in val["markers"]:
            rec = dict(m)
            rec["service_index_name"] = val["service_index_name"]
            rec["outages"] = val["outages"]
            rec["NumConsumers"] = val["stats"]["NumConsumers"]
            rec["isHighTraffic"] = doc["isHighTraffic"]
            rows.append(rec)
    return {"per_outage": rows}, []


# -- TX1: fixed-header report table, VIEW dropped (tx_scraper.py:33–70) -----------

def parse_tx1(payload: bytes, url: str = "") -> ParseOut:
    tables = extract_tables(payload.decode())
    if not tables:
        return {}, []
    recs = table_records(tables[0])
    key = "ZIP" if "zip" in url.rsplit("/", 1)[-1] else "COUNTY"
    rows = []
    for r in recs:
        r.pop("VIEW", None)  # dropped by reference
        if r.get("CUSTOMER OUTAGES") != "0":  # string-typed compare
            rows.append(r)
    level = "per_zipcode" if key == "ZIP" else "per_county"
    return {level: rows}, []


# -- TX6: JSONP strip + attributes/geometry + ms casts (tx_scraper.py:230–286) -----

_JSONP = re.compile(r"^[\w.$]+\((.*)\);?\s*$", re.S)


def parse_tx6(payload: bytes) -> ParseOut:
    body = payload.decode()
    m = _JSONP.match(body)
    if m:
        body = m.group(1)
    doc = json.loads(body)
    rows = []
    for f in doc["features"]:
        rec = dict(f["attributes"])
        rec["x"] = f["geometry"]["x"]
        rec["y"] = f["geometry"]["y"]
        rec["BEGINTIME"] = _ms_to_str(rec["BEGINTIME"])
        rec["ESTIMATEDTIMERESTORATION"] = _ms_to_str(rec["ESTIMATEDTIMERESTORATION"])
        rows.append(rec)
    return {"per_outage": rows}, []


# -- TX7: double-encoded d → Table, dropna (tx_scraper.py:289–324) -----------------

def parse_tx7(payload: bytes) -> ParseOut:
    outer = json.loads(payload)
    table = json.loads(outer["d"])["Table"]
    rows = [r for r in table if all(v is not None for v in r.values())]  # dropna
    return {"per_outage": rows}, []


# -- TX10: outageLst + per-row zipcode geocode guard (tx_scraper.py:327–344) --------

def parse_tx10(payload: bytes) -> ParseOut:
    lst = json.loads(payload)["outageLst"]
    # same <10-row geocode guard as GA1/GA5 (tx_scraper.py:336–338)
    if len(lst) >= 10:
        for o in lst:
            o["zipcode"] = ZIP_GUARD_SENTINEL
    else:
        for o in lst:
            o["zipcode"] = f"{75000 + int(abs(o['lat'] * 100)) % 9999:05d}"
    return {"per_outage": lst}, []


# -- FL1: <pre> JSON, string zeros (fl_scraper.py:24–53) ----------------------------

_PRE = re.compile(r"<pre>(.*?)</pre>", re.S)


def _pre_json(payload: bytes):
    body = payload.decode()
    m = _PRE.search(body)
    return json.loads(m.group(1) if m else body)


def parse_fl1(payload: bytes) -> ParseOut:
    doc = _pre_json(payload)
    rows = [o for o in doc["outages"] if o["Customers Out"] != "0"]  # string compare
    return {"per_county": rows}, []


# -- FL3: explicit 7-col projection (fl_scraper.py:105–158) --------------------------

_FL3_COLS = ["id", "numPeople", "latitude", "longitude", "crewStatus", "startTime", "estRestore"]


def parse_fl3(payload: bytes) -> ParseOut:
    items = _pre_json(payload)
    rows = []
    for it in items:
        if it["numPeople"] != 0:
            rec = {c: it[c] for c in _FL3_COLS}  # explicit projection
            rec["startTime"] = _ms_to_str(rec["startTime"])
            rec["estRestore"] = _ms_to_str(rec["estRestore"])
            rows.append(rec)
    return {"per_outage": rows}, []


# -- FL7: <pre> JSON returndata wrapper (fl_scraper.py:295–322) ------------------------

def parse_fl7(payload: bytes) -> ParseOut:
    doc = _pre_json(payload)
    return {"per_outage": doc["returndata"]}, []


# -- FL5: Elasticsearch hits.hits → _id/_source (fl_scraper.py:208–259) ---------------

def parse_fl5(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    rows = []
    for hit in doc["hits"]["hits"]:
        rec = {"_id": hit["_id"], **hit["_source"]}
        rows.append(rec)
    return {"per_outage": rows}, []


# -- IL7: city/county/metro endpoints (il_scraper.py:224–277) --------------------------

def parse_il7(payload: bytes, url: str = "") -> ParseOut:
    rows = [r for r in json.loads(payload) if r["NumOutages"] != 0]
    kind = "city"
    for k in ("city", "county", "metro"):  # endpoint suffix routes the level
        if url.endswith(f"{k}.json"):
            kind = k
            break
    return {f"per_{kind}": rows}, []


# -- IL8: AreaSummary three levels (il_scraper.py:280–327) ------------------------------

def parse_il8(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    out: Levels = {}
    for key, level in (
        ("ZipCodes", "per_zipcode"),
        ("Counties", "per_county"),
        ("Districts", "per_district"),
    ):
        out[level] = [r for r in doc.get(key, []) if r["Out"] != 0]
    return out, []


# -- TN5: incidents, nested outage_reported (tn_scraper.py:113–172) ----------------------

def parse_tn5(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    districts: dict[str, int] = {}
    outages = []
    for inc in doc["incidents"]:
        rec = dict(inc)
        rep = rec.pop("outage_reported")
        rec["customersAffected"] = rep["customersAffected"]
        rec["reportedAt"] = _ms_to_str(rep["reportedAt"])
        outages.append(rec)
        districts[rec["district"]] = districts.get(rec["district"], 0) + rec["customersAffected"]
    per_district = [
        {"district": d, "customersAffected": v} for d, v in districts.items()
    ]
    return {"per_district": per_district, "per_outage": outages}, []


# -- LA3: delete struct fields (la_scraper.py:40–74, O30) --------------------------------

def parse_la3(payload: bytes) -> ParseOut:
    rows = []
    for it in json.loads(payload):
        rec = dict(it)
        rec.pop("extension", None)
        rec.pop("affectedAreas", None)
        rows.append(rec)
    return {"per_outage": rows}, []


# -- MS7: reports[0/1].polygons (ms_scraper.py:41–74) -------------------------------------

def parse_ms7(payload: bytes) -> ParseOut:
    doc = json.loads(payload)
    county = [p for p in doc["reports"][0]["polygons"] if p["affected"] != 0]
    district = [p for p in doc["reports"][1]["polygons"] if p["affected"] != 0]
    return {"per_county": county, "per_district": district}, []


# -- MS10: two DOM ids → one row (ms_scraper.py:77–103) ------------------------------------

_MS10_OUT = re.compile(r'id="lblOutagesNow">(\d+)<')
_MS10_SERVED = re.compile(r'id="lblCustomersServed">(\d+)<')


def parse_ms10(payload: bytes) -> ParseOut:
    body = payload.decode()
    out = _MS10_OUT.search(body)
    served = _MS10_SERVED.search(body)
    rec = {
        "outages_now": out.group(1) if out else None,
        "customers_served": served.group(1) if served else None,
    }
    return {"per_emc": [rec]}, []


# -- IL1: nested areas[0].areas, conditional {val} unwrap (il_scraper.py:37–131) --

def parse_il1(payload: bytes, url: str = "") -> ParseOut:
    doc = json.loads(payload)
    level = "per_zipcode" if url.endswith("report_zip.json") else "per_county"
    rows = []
    for a in doc["file_data"]["areas"][0]["areas"]:
        rec = dict(a)
        if isinstance(rec.get("cust_a"), dict):  # {val:…} sometimes wraps
            rec["cust_a"] = rec["cust_a"]["val"]
        if rec["cust_a"] != 0 or rec.get("n_out", 0) != 0:
            rows.append(rec)
    return {level: rows}, []


# -- NY1: two-state XHR pair (ny_scraper.py:33–153) ------------------------------

def parse_ny1(payload: bytes, url: str = "") -> ParseOut:
    doc = json.loads(payload)
    level = "per_borough" if url.endswith("report_nyc.json") else "per_area"
    rows = [r for r in doc["rows"] if r["customersAffected"] != 0]
    return {level: rows}, []


# -- TN2: reportTable per dropdown level (tn_scraper.py:38–110) -------------------

def parse_tn2(payload: bytes, url: str = "") -> ParseOut:
    tables = extract_tables(payload.decode())
    if not tables:
        return {}, []
    recs = [r for r in table_records(tables[0]) if r.get("Aff") != "0"]  # string cmp
    level = f"per_{url.rsplit('/', 1)[-1]}" if "/report/" in url else "per_county"
    return {level: recs}, []


# -- NY3: county table + URL-templated town pages (ny_scraper.py:230–313) ----------
# Child URLs are built by splicing each county name into the source URL
# before its extension (ny_scraper.py:308–310: src[:-5] + County + src[-5:]).
# The reference drops the last table row (footer) — table_rows[1:-1].

def _ny3_table_rows(payload: bytes) -> list[dict]:
    tables = extract_tables(payload.decode())
    if len(tables) < 2:
        return []
    recs = table_records(tables[1])
    return recs[:-1] if recs else []  # reference ignores the last tr


def parse_ny3_county(payload: bytes, url: str = "") -> ParseOut:
    rows = _ny3_table_rows(payload)
    children = [f"{url[:-5]}{r['County']}{url[-5:]}" for r in rows if r.get("County")]
    return {"per_county": rows}, children


def parse_ny3_town(payload: bytes) -> ParseOut:
    return {"per_town": _ny3_table_rows(payload)}, []


# -- NC7: treegrid rows (nc_scraper.py:151–259) ------------------------------------

def parse_nc7(payload: bytes) -> ParseOut:
    tables = extract_tables(payload.decode())
    if not tables:
        return {}, []
    rows = [
        r for r in table_records(tables[0])
        if r.get("cust_a") not in (None, "0")  # string-typed zero
    ]
    return {"per_county": rows}, []


# -- NC6: Duke 5-column summary table (nc_scraper.py:23–143; FL twin is
# fl_scraper.py:357–483). The reference filters `Number of Outages != 0`
# — an INT compare against DOM-scraped strings, which is a no-op — so
# parity here means keeping every row, zeros included.

def parse_nc6(payload: bytes) -> ParseOut:
    tables = extract_tables(payload.decode())
    if not tables:
        return {}, []
    return {"per_county": table_records(tables[0])}, []


# -- FL9: Duke Energy clicked-through outage summary (fl_scraper.py:357–485).
# The reference drives a browser through three clicks (jurisdiction →
# "Report & View Outages" → "Outage Summary" → table toggle) and then reads
# div/span rows BY CLASS, not via an HTML <table>: rows are
# `outage-summary-table-content-row`, cells
# `outage-summary-table-content-body-item` (fl_scraper.py:462–474), into
# fixed columns (fl_scraper.py:396–402). The click-through itself is
# browser-scope (SURVEY O5); the engine parses the captured POST-click DOM.
# The zero filter is `!= 0` (int) against DOM strings — a no-op
# (fl_scraper.py:369) — so every row is kept, zeros included.

_FL9_KEYS = (
    "Location", "Number of Outages", "Affected Customers",
    "Percentage Affected", "Last Updated",
)


class _Fl9Dom(HTMLParser):
    """Class-selector extraction of the Duke summary rows: depth-tracked so
    nested markup inside a row/cell can't close it early."""

    def __init__(self):
        super().__init__()
        self.rows: list[list[str]] = []
        self._cells: list[str] | None = None
        self._cell: list[str] | None = None
        self._row_depth = 0
        self._cell_depth = 0

    def handle_starttag(self, tag, attrs):
        classes = (dict(attrs).get("class") or "").split()
        if self._cell is not None:
            self._cell_depth += 1
        elif self._cells is not None and "outage-summary-table-content-body-item" in classes:
            self._cell = []
            self._cell_depth = 0
        elif self._cells is not None:
            self._row_depth += 1
        elif "outage-summary-table-content-row" in classes:
            self._cells = []
            self._row_depth = 0

    def handle_endtag(self, tag):
        if self._cell is not None:
            if self._cell_depth:
                self._cell_depth -= 1
            else:
                # .text semantics: whitespace-normalized visible text
                self._cells.append(" ".join("".join(self._cell).split()))
                self._cell = None
        elif self._cells is not None:
            if self._row_depth:
                self._row_depth -= 1
            else:
                self.rows.append(self._cells)
                self._cells = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def parse_fl9(payload: bytes) -> ParseOut:
    dom = _Fl9Dom()
    dom.feed(payload.decode())
    # reference indexes cells[0..4] unconditionally (fl_scraper.py:469–474)
    # — a short row there is an IndexError; here it is dropped, which is
    # the per-URL-failure-capture analog of that crash
    rows = [dict(zip(_FL9_KEYS, cells)) for cells in dom.rows if len(cells) >= 5]
    return {"per_county": rows}, []


# -- cc: Common-Crawl-style page (bench family) --------------------------------

_TAG_STRIP = re.compile(r"<script.*?</script>|<style.*?</style>|<[^>]+>", re.S)
_WS = re.compile(r"\s+")


def parse_cc(payload: bytes):
    """Boilerplate-stripped text extraction from a web page: drop
    script/style, strip tags, collapse whitespace. Returns a 3-tuple —
    the third element IS the page text (the byte-identical-per-url
    invariant), so it is never duplicated into the record JSON."""
    raw = payload.decode("utf-8", errors="replace")
    # " ".join(split()) == _WS.sub(" ", ...).strip() byte-for-byte (both
    # collapse \s+ runs and trim), but the C split loop is ~3x faster than
    # the regex — this line is the per-page hot path of the crawl bench;
    # n_tokens = len(words) == text.count(" ")+1 (and 0 when empty)
    words = _TAG_STRIP.sub(" ", raw).split()
    text = " ".join(words)
    rec = {
        "n_tokens": len(words),
        "n_chars": len(text),
    }
    return {"per_page": [rec]}, [], text


_XLINK = re.compile(r'<a class="xlink" href="([^"]+)"')


def parse_ccl(payload: bytes):
    """Linked web page: parse_cc's boilerplate-stripped text extraction
    PLUS outlink discovery (class=xlink anchors in document order,
    visited-deduped like the kubra two-hop path) — the family the
    PageRank-reprioritized crawl soak runs on. Text stays byte-identical
    per URL; anchor text rides the same tag-strip as everything else."""
    rec, _, text = parse_cc(payload)
    seen: set[str] = set()
    children = []
    for href in _XLINK.findall(payload.decode("utf-8", errors="replace")):
        if href not in seen:
            seen.add(href)
            children.append(href)
    return rec, children, text


PARSERS: dict[str, callable] = {
    "ga1_boundaries": parse_ga1_boundaries,
    "ga1_outages": parse_ga1_outages,
    "ga2": parse_ga2,
    "ga3": parse_ga3,
    "kubra_anchor": parse_kubra_anchor,
    "kubra_report": parse_kubra_report,
    "tx5_report": parse_tx5_report,
    "ga5": parse_ga5,
    "ga6": parse_ga6,
    "ga7": parse_ga7,
    "ga9_landing": parse_ga9_landing,
    "ga9_table": parse_ga9_table,
    "ga10": parse_ga10,
    "ga11_subs": parse_ga11_subs,
    "ga11_county": parse_ga11_county,
    "ga11_outages": parse_ga11_outages,
    "tx1": parse_tx1,
    "tx4": parse_tx4,
    "tx6": parse_tx6,
    "tx7": parse_tx7,
    "tx10": parse_tx10,
    "tn5": parse_tn5,
    "tn7": parse_tn7,
    "fl1": parse_fl1,
    "fl3": parse_fl3,
    "fl5": parse_fl5,
    "fl7": parse_fl7,
    "fl13": parse_fl13,
    "il7": parse_il7,
    "il8": parse_il8,
    "la3": parse_la3,
    "ms7": parse_ms7,
    "ms10": parse_ms10,
    "ny1": parse_ny1,
    "tn2": parse_tn2,
    "nc7": parse_nc7,
    "fl9": parse_fl9,
    "nc6": parse_nc6,
    "il1": parse_il1,
    "ny3_county": parse_ny3_county,
    "ny3_town": parse_ny3_town,
    "ca_inv": parse_ca_inv,
    "cc": parse_cc,
    "ccl": parse_ccl,
}


# Families whose record level depends on which endpoint URL was fetched
# (the reference routes by fetch call site; the engine routes by URL).
URL_AWARE = {"tx1", "tx4", "il7", "ny1", "tn2", "il1", "ga9_landing", "ga9_table", "ny3_county"}


def parse_payload(kind: str, payload: bytes, url: str = "") -> tuple[Levels, list[str], str | None]:
    """Normalized parser call: (levels, children, explicit_text|None).
    Parsers returning 2-tuples get their text derived via canonical_text
    by the parse stage; a 3-tuple parser supplies the page text itself."""
    fn = PARSERS[kind]
    out = fn(payload, url) if kind in URL_AWARE else fn(payload)
    if len(out) == 2:
        levels, children = out
        return levels, children, None
    return out


def canonical_text(levels: Levels) -> str:
    """The byte-identical extracted-text invariant target per URL: compact
    canonical JSON of the parsed record levels (insertion-ordered keys,
    deterministic by construction)."""
    return json.dumps(levels, separators=(",", ":"), ensure_ascii=False)
