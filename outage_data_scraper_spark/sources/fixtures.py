"""Deterministic payload renderer — the engine's stand-in for the network.

Tests and benches never touch the network (SURVEY.md §5): every fetch is
served by this renderer, which produces a stable payload for a (family,
url) pair from a keyed hash of the URL. Payload shapes mirror the site
families documented in FIXTURES.md §3 / SURVEY.md §2.2:

- ga1        two JSON endpoints (boundaries / outages)   ga_scraper.py:205–266
- ga3        XML ASMX county + outage docs               ga_scraper.py:330–348
- kubra      rendered anchor page + per-report JSONs     ga_scraper.py:351–436
- ga9        HTML tables, header-derived columns         ga_scraper.py:597–689
- tx4        flat JSON list with ms epochs               tx_scraper.py:85–114
- tn7        outage details JSON (rollup source)         tn_scraper.py:175–227
- fl13       regionDataSets JSON                         fl_scraper.py:488–518
- ca_inv     ArcGIS features JSON                        ca_scraper.py:14–63

Everything is pure-Python and importable on executors; no Spark imports.
"""

from __future__ import annotations

import hashlib
import json
import math
import re

MASK63 = (1 << 63) - 1


def _h(url: str) -> int:
    return int.from_bytes(hashlib.blake2b(url.encode(), digest_size=8).digest(), "big")


def _rnd(h: int, i: int, mod: int) -> int:
    x = (h * 6364136223846793005 + (i + 1) * 1442695040888963407) & MASK63
    x ^= x >> 31
    return x % mod


# --------------------------------------------------------------------------
# Per-family renderers. Each returns payload bytes for a concrete endpoint.
# --------------------------------------------------------------------------

def render_ga1_boundaries(url: str) -> bytes:
    h = _h(url)
    n = 2 + _rnd(h, 0, 4)
    boundaries = [
        {
            "name": f"County{_rnd(h, 10 + i, 97):02d}",
            # zeros on purpose: exercises the != 0 active-outage filter (O9)
            "customersAffected": 0 if _rnd(h, 20 + i, 4) == 0 else _rnd(h, 30 + i, 500),
            "customersOutNow": 0 if _rnd(h, 40 + i, 3) == 0 else _rnd(h, 50 + i, 200),
        }
        for i in range(n)
    ]
    return json.dumps([{"boundaries": boundaries}]).encode()


def render_ga1_outages(url: str) -> bytes:
    h = _h(url)
    n = 1 + _rnd(h, 1, 12)
    outages = [
        {
            "outageRecID": f"O{h % 100000}-{i}",
            "outageStartTime": f"2024-08-0{1 + _rnd(h, 60 + i, 7)}T"
            f"{_rnd(h, 70 + i, 24):02d}:{_rnd(h, 80 + i, 60):02d}:00Z",
            "customersOutNow": 1 + _rnd(h, 90 + i, 300),
            "outagePoint": {
                "lat": 30.0 + _rnd(h, 100 + i, 5000) / 1000.0,
                "lng": -85.0 + _rnd(h, 110 + i, 5000) / 1000.0,
            },
            "zip": f"{30000 + _rnd(h, 120 + i, 9999):05d}",
        }
        for i in range(n)
    ]
    return json.dumps(outages).encode()


def render_ga3(url: str) -> bytes:
    h = _h(url)
    n = 2 + _rnd(h, 0, 3)
    counties = "".join(
        f"<MobileCounty><CountyName>C{_rnd(h, i, 50)}</CountyName>"
        f"<CustomersAffected>{0 if _rnd(h, 9 + i, 3) == 0 else _rnd(h, 5 + i, 400)}</CustomersAffected>"
        f"<Shape>poly{i}</Shape></MobileCounty>"
        for i in range(n)
    )
    outs = "".join(
        f"<MobileOutage><X>{-85 + _rnd(h, 30 + i, 100) / 10.0}</X>"
        f"<Y>{31 + _rnd(h, 40 + i, 100) / 10.0}</Y>"
        f"<CustomersAffected>{1 + _rnd(h, 50 + i, 60)}</CustomersAffected></MobileOutage>"
        for i in range(1 + _rnd(h, 2, 4))
    )
    return (
        f"<root><ArrayOfMobileCounty>{counties}</ArrayOfMobileCounty>"
        f"<MobileOutageInfo><Outages>{outs}</Outages></MobileOutageInfo></root>"
    ).encode()


def kubra_child_urls(url: str) -> list[str]:
    """Deterministic child report URLs for a kubra-style anchor page
    (two-hop discovery, ga_scraper.py:381–436). Keyword in the name routes
    the record type (O15)."""
    h = _h(url)
    kinds = ["county", "zip", "city"]
    return [
        f"https://reports.kubra-fixture.io/{h % 100000}/report-{kinds[i]}.json"
        for i in range(2 + _rnd(h, 3, 2))
    ]


def render_kubra_anchor(url: str) -> bytes:
    links = "".join(
        f'<a class="report-link" href="{c}">view</a>' for c in kubra_child_urls(url)
    )
    return f"<html><body><div>{links}</div></body></html>".encode()


def render_kubra_report(url: str) -> bytes:
    h = _h(url)
    n = 2 + _rnd(h, 0, 5)
    areas = [
        {
            "name": f"Area{_rnd(h, 10 + i, 80)}",
            "cust_a": {"val": 0 if _rnd(h, 20 + i, 4) == 0 else _rnd(h, 25 + i, 900)},
            "percent_cust_a": {"val": _rnd(h, 30 + i, 1000) / 100.0},
            "n_out": 0 if _rnd(h, 35 + i, 5) == 0 else _rnd(h, 40 + i, 40),
            "gotoMap": f"map{i}",
        }
        for i in range(n)
    ]
    title = url.rsplit("report-", 1)[-1].split(".")[0]
    return json.dumps({"file_title": title, "file_data": {"areas": areas}}).encode()


def ga9_levels(url: str) -> list[str]:
    """Dropdown levels discovered at runtime on the GA9 landing page
    (ga_scraper.py:680–688); deterministic per seed."""
    h = _h(url)
    all_levels = ["zone", "county", "district"]
    return all_levels[: 1 + _rnd(h, 99, 3)]


def render_ga9_landing(url: str) -> bytes:
    options = "".join(f'<option value="{lv}">{lv}</option>' for lv in ga9_levels(url))
    return (
        f"<html><body><select id='level'>{options}</select>"
        "<div>select a level</div></body></html>"
    ).encode()


def render_ga9_table(url: str) -> bytes:
    h = _h(url)
    level = url.rsplit("level=", 1)[-1].title()
    rows = "".join(
        f"<tr><td>{level}{_rnd(h, i, 60)}</td>"
        f"<td>{0 if _rnd(h, 7 + i, 3) == 0 else _rnd(h, 9 + i, 150)}</td>"
        f"<td>{100 + _rnd(h, 11 + i, 4000)}</td></tr>"
        for i in range(2 + _rnd(h, 1, 5))
    )
    return (
        "<html><body><table><tr><td>nav</td></tr></table>"
        "<table><tr><th>Name</th><th># Out</th><th># Served</th></tr>"
        f"{rows}</table></body></html>"
    ).encode()


def render_tx4(url: str) -> bytes:
    h = _h(url)
    items = [
        {
            "name": f"Unit{_rnd(h, i, 70)}",
            "customersAffected": 0 if _rnd(h, 5 + i, 4) == 0 else _rnd(h, 6 + i, 250),
            "lastUpdatedTime": 1722470400000 + _rnd(h, 8 + i, 86400) * 1000,
        }
        for i in range(2 + _rnd(h, 2, 5))
    ]
    return json.dumps(items).encode()


def render_tn7(url: str) -> bytes:
    h = _h(url)
    details = [
        {
            "id": f"T{h % 10000}-{i}",
            "county": f"County{_rnd(h, 3 + i, 8)}",
            "zipcode": f"{37000 + _rnd(h, 4 + i, 99):05d}",
            "customerCount": 1 + _rnd(h, 5 + i, 120),
            "lat": 35.0 + _rnd(h, 6 + i, 2000) / 1000.0,
            "lon": -86.0 + _rnd(h, 7 + i, 2000) / 1000.0,
        }
        for i in range(3 + _rnd(h, 1, 8))
    ]
    return json.dumps({"electricOutageDetails": details}).encode()


def render_fl13(url: str) -> bytes:
    h = _h(url)
    sets = [
        {
            "id": kind,
            "regions": [
                {
                    "name": f"R{_rnd(h, j + k * 10, 40)}",
                    "numberOut": 0 if _rnd(h, 20 + j + k * 10, 4) == 0 else _rnd(h, 21 + j, 90),
                    "customersAffected": _rnd(h, 22 + j + k * 10, 700),
                }
                for j in range(2 + _rnd(h, k, 3))
            ],
        }
        for k, kind in enumerate(["county", "zip"])
    ]
    return json.dumps({"regionDataSets": sets}).encode()


def render_ca_inv(url: str) -> bytes:
    h = _h(url)
    feats = [
        {
            "attributes": {
                "OBJECTID": i + 1,
                "UtilityCompany": f"Utility{h % 7}",
                "City": f"City{_rnd(h, i, 30)}",
                "County": f"County{_rnd(h, 2 + i, 12)}",
                "ZipCode": f"{90000 + _rnd(h, 3 + i, 999):05d}",
                "OutageStatus": ["ON-GOING", "RESTORED"][_rnd(h, 4 + i, 2)],
                "StartDate": 1722470400000 + _rnd(h, 5 + i, 86400) * 1000,
                "EstimatedRestoreDate": 1722556800000 + _rnd(h, 6 + i, 86400) * 1000,
                "ImpactedCustomers": 1 + _rnd(h, 7 + i, 500),
            },
            "geometry": {
                "x": -120.0 + _rnd(h, 8 + i, 8000) / 1000.0,
                "y": 35.0 + _rnd(h, 9 + i, 6000) / 1000.0,
            },
        }
        for i in range(1 + _rnd(h, 0, 6))
    ]
    return json.dumps({"features": feats}).encode()


# -- GA2: JSON Outages with OutageLocation X/Y (ga_scraper.py:269–297) --------

def render_ga2(url: str) -> bytes:
    h = _h(url)
    outages = [
        {
            "OutageLocation": {
                "X": -84.0 + _rnd(h, 10 + i, 4000) / 1000.0,
                "Y": 32.0 + _rnd(h, 20 + i, 4000) / 1000.0,
            },
            "CustomersOutNow": _rnd(h, 30 + i, 200),
            "OutageStartTime": f"2024-08-0{1 + _rnd(h, 40 + i, 7)} "
            f"{_rnd(h, 50 + i, 24):02d}:{_rnd(h, 60 + i, 60):02d}:00",
        }
        for i in range(1 + _rnd(h, 0, 6))
    ]
    return json.dumps({"Outages": outages}).encode()


# -- GA5: flat JSON list with ms epochs + zip guard (ga_scraper.py:439–479) ----

def render_ga5(url: str) -> bytes:
    h = _h(url)
    n = 1 + _rnd(h, 1, 14)  # crosses the <10 zip guard both ways
    items = [
        {
            "id": f"G5-{h % 10000}-{i}",
            "startTime": 1722470400000 + _rnd(h, 10 + i, 86400) * 1000,
            "lastUpdatedTime": 1722474000000 + _rnd(h, 20 + i, 86400) * 1000,
            "lat": 33.0 + _rnd(h, 30 + i, 3000) / 1000.0,
            "lng": -84.0 + _rnd(h, 40 + i, 3000) / 1000.0,
            "numPeople": 1 + _rnd(h, 50 + i, 120),
        }
        for i in range(n)
    ]
    return json.dumps(items).encode()


# -- GA6: reportData polygons + outageData (ga_scraper.py:482–510) -------------

def render_ga6(url: str) -> bytes:
    h = _h(url)
    polys = [
        {
            "name": f"Area{_rnd(h, i, 60)}",
            "affected": 0 if _rnd(h, 5 + i, 4) == 0 else _rnd(h, 6 + i, 300),
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    outs = [
        {"id": f"O{h % 999}-{i}", "custsOut": 1 + _rnd(h, 30 + i, 90)}
        for i in range(1 + _rnd(h, 2, 4))
    ]
    return json.dumps(
        {"reportData": {"polygons": polys}, "outageData": {"outages": outs}}
    ).encode()


# -- GA7: ShellOut markers (ga_scraper.py:513–589) ------------------------------

def render_ga7(url: str) -> bytes:
    h = _h(url)
    markers = [
        {
            "lat": 34.0 + _rnd(h, 10 + i, 2000) / 1000.0,
            "lon": -83.0 + _rnd(h, 20 + i, 2000) / 1000.0,
            "outages": 1 + _rnd(h, 30 + i, 9),
            "NumConsumers": 1 + _rnd(h, 40 + i, 400),
        }
        for i in range(1 + _rnd(h, 0, 5))
    ]
    return json.dumps(
        {
            "isHighTraffic": bool(_rnd(h, 1, 2)),
            "service_index_name": f"svc{h % 17}",
            "markers": markers,
        }
    ).encode()


# -- GA10: ArcGIS attributes, lowercased, string zeros (ga_scraper.py:692–741) --

def render_ga10(url: str) -> bytes:
    h = _h(url)
    feats = [
        {
            "attributes": {
                "County": f"County{_rnd(h, i, 30)}",
                "Members Affected": str(0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 250)),
                "Members Served": str(500 + _rnd(h, 7 + i, 4000)),
            }
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    return json.dumps({"features": feats}).encode()


# -- GA11: three ShellOut endpoints (ga_scraper.py:744–850) ---------------------

def render_ga11_subs(url: str) -> bytes:
    h = _h(url)
    subs = [
        {
            "SubName": f"Sub{_rnd(h, i, 40)}",
            "SubTotalConsumersOut": 0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 150),
            "SubTotalMetersAffectedByDeviceOutages": _rnd(h, 7 + i, 200),
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    return json.dumps({"rows": {"subs": subs}}).encode()


def render_ga11_county(url: str) -> bytes:
    h = _h(url)
    rows = [
        {"name": f"County{_rnd(h, i, 25)}", "out": 0 if _rnd(h, 8 + i, 3) == 0 else _rnd(h, 9 + i, 99)}
        for i in range(2 + _rnd(h, 1, 4))
    ]
    return json.dumps({"rows": rows}).encode()


def render_ga11_outages(url: str) -> bytes:
    h = _h(url)
    markers = [
        {"lat": 33.5 + _rnd(h, 10 + i, 900) / 1000.0, "lon": -84.5 + _rnd(h, 20 + i, 900) / 1000.0}
        for i in range(1 + _rnd(h, 2, 5))
    ]
    return json.dumps(
        {
            "isHighTraffic": False,
            "timestamp": "2024-08-01 12:00:00",
            "m0": {
                "markers": markers,
                "service_index_name": f"svc{h % 9}",
                "outages": len(markers),
                "stats": {"NumConsumers": 10 + _rnd(h, 3, 500)},
            },
        }
    ).encode()


# -- TX1: report-table HTML, county/zip endpoints (tx_scraper.py:33–70) ---------

def render_tx1(url: str) -> bytes:
    h = _h(url)
    kind = "ZIP" if url.endswith("report-zip.html") else "COUNTY"
    rows = "".join(
        f"<tr><td>view</td><td>{kind.title()}{_rnd(h, i, 70)}</td>"
        f"<td>{0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 180)}</td>"
        f"<td>{200 + _rnd(h, 7 + i, 5000)}</td>"
        f"<td>{_rnd(h, 8 + i, 100)}%</td></tr>"
        for i in range(2 + _rnd(h, 1, 5))
    )
    return (
        '<html><body><table class="report-table tree">'
        f"<tr><th>VIEW</th><th>{kind}</th><th>CUSTOMER OUTAGES</th>"
        f"<th>CUSTOMERS SERVED</th><th>% AFFECTED</th></tr>{rows}</table></body></html>"
    ).encode()


# -- TX6: ArcGIS envelope, optionally JSONP-wrapped (tx_scraper.py:230–286) -----

def render_tx6(url: str) -> bytes:
    h = _h(url)
    feats = [
        {
            "attributes": {
                "OBJECTID": i + 1,
                "BEGINTIME": 1722470400000 + _rnd(h, 10 + i, 86400) * 1000,
                "ESTIMATEDTIMERESTORATION": 1722556800000 + _rnd(h, 20 + i, 86400) * 1000,
                "CUSTOMERSAFFECTED": 1 + _rnd(h, 30 + i, 220),
            },
            "geometry": {"x": -97.0 + _rnd(h, 40 + i, 5000) / 1000.0,
                          "y": 30.0 + _rnd(h, 50 + i, 5000) / 1000.0},
        }
        for i in range(1 + _rnd(h, 0, 5))
    ]
    body = json.dumps({"features": feats})
    # half the URLs get the JSONP wrapper the reference strips
    return (f"dojo_request_script_callbacks.cb({body});" if h % 2 else body).encode()


# -- TX7: double-encoded JSON d → Table (tx_scraper.py:289–324) ------------------

def render_tx7(url: str) -> bytes:
    h = _h(url)
    table = [
        {
            "OutageID": f"T7-{h % 999}-{i}",
            "Lat": 29.0 + _rnd(h, 10 + i, 900) / 1000.0,
            "Long": -98.0 + _rnd(h, 20 + i, 900) / 1000.0,
            "CustomersAffected": _rnd(h, 30 + i, 80) if _rnd(h, 40 + i, 4) else None,
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    inner = json.dumps({"Table": table})
    return json.dumps({"d": inner}).encode()


# -- TX10: outageLst with per-row geocode (tx_scraper.py:327–344) ----------------

def render_tx10(url: str) -> bytes:
    h = _h(url)
    lst = [
        {
            "outageId": f"X{h % 999}-{i}",
            "lat": 31.0 + _rnd(h, 10 + i, 900) / 1000.0,
            "lng": -99.0 + _rnd(h, 20 + i, 900) / 1000.0,
            "customersAffected": 1 + _rnd(h, 30 + i, 75),
        }
        for i in range(1 + _rnd(h, 0, 12))
    ]
    return json.dumps({"outageLst": lst}).encode()


# -- FL1: <pre> JSON with string-typed zeros (fl_scraper.py:24–53) --------------

def render_fl1(url: str) -> bytes:
    h = _h(url)
    outages = [
        {
            "County": f"County{_rnd(h, i, 20)}",
            "Customers Out": str(0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 300)),
            "Customers Served": str(1000 + _rnd(h, 7 + i, 9000)),
        }
        for i in range(2 + _rnd(h, 0, 5))
    ]
    body = json.dumps({"outages": outages})
    return f"<html><body><pre>{body}</pre></body></html>".encode()


# -- FL3: explicit 7-col projection (fl_scraper.py:105–158) ----------------------

def render_fl3(url: str) -> bytes:
    h = _h(url)
    items = [
        {
            "id": f"F3-{h % 999}-{i}",
            "numPeople": 0 if _rnd(h, 5 + i, 4) == 0 else _rnd(h, 6 + i, 160),
            "latitude": 28.0 + _rnd(h, 10 + i, 900) / 1000.0,
            "longitude": -81.0 + _rnd(h, 20 + i, 900) / 1000.0,
            "crewStatus": ["ASSIGNED", "ENROUTE", "ONSITE"][_rnd(h, 30 + i, 3)],
            "startTime": 1722470400000 + _rnd(h, 40 + i, 86400) * 1000,
            "estRestore": 1722556800000 + _rnd(h, 50 + i, 86400) * 1000,
            "internalNote": "drop-me",  # not in the 7-col projection
        }
        for i in range(2 + _rnd(h, 0, 5))
    ]
    body = json.dumps(items)
    return f"<pre>{body}</pre>".encode()


# -- FL7: <pre> JSON returndata wrapper (fl_scraper.py:295–322) --------------------

def render_fl7(url: str) -> bytes:
    h = _h(url)
    items = [
        {
            "outageId": f"F7-{h % 999}-{i}",
            "affected": 1 + _rnd(h, 5 + i, 130),
            "cause": ["TREE", "EQUIPMENT", "UNKNOWN"][_rnd(h, 6 + i, 3)],
            "lat": 27.0 + _rnd(h, 10 + i, 900) / 1000.0,
            "lon": -82.0 + _rnd(h, 20 + i, 900) / 1000.0,
        }
        for i in range(1 + _rnd(h, 0, 5))
    ]
    body = json.dumps({"returndata": items})
    return f"<pre>{body}</pre>".encode()


# -- FL5: Elasticsearch hits (fl_scraper.py:208–259) -----------------------------

def render_fl5(url: str) -> bytes:
    h = _h(url)
    hits = [
        {
            "_id": f"es-{h % 9999}-{i}",
            "_source": {
                "county": f"County{_rnd(h, i, 15)}",
                "customersAffected": 1 + _rnd(h, 5 + i, 140),
                "status": ["active", "restored"][_rnd(h, 6 + i, 2)],
            },
        }
        for i in range(1 + _rnd(h, 0, 6))
    ]
    return json.dumps({"hits": {"hits": hits}}).encode()


# -- IL7: City/County/Metro XHRs (il_scraper.py:224–277) -------------------------

def render_il7(url: str) -> bytes:
    h = _h(url)
    kind = url.rsplit("/", 1)[-1].replace(".json", "")  # city|county|metro
    rows = [
        {
            "Name": f"{kind.title()}{_rnd(h, i, 45)}",
            "NumOutages": 0 if _rnd(h, 5 + i, 4) == 0 else _rnd(h, 6 + i, 70),
            "NumCustomersAffected": _rnd(h, 7 + i, 800),
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    return json.dumps(rows).encode()


# -- IL8: AreaSummary (il_scraper.py:280–327) ------------------------------------

def render_il8(url: str) -> bytes:
    h = _h(url)
    def block(kind, k):
        return [
            {"Area": f"{kind}{_rnd(h, k * 20 + i, 50)}",
             "Out": 0 if _rnd(h, k * 30 + i, 4) == 0 else _rnd(h, k * 40 + i, 60),
             "Served": 100 + _rnd(h, k * 50 + i, 3000)}
            for i in range(2 + _rnd(h, k, 3))
        ]
    return json.dumps(
        {"ZipCodes": block("Z", 1), "Counties": block("C", 2), "Districts": block("D", 3)}
    ).encode()


# -- TN5: incidents with nested outage_reported (tn_scraper.py:113–172) -----------

def render_tn5(url: str) -> bytes:
    h = _h(url)
    incidents = [
        {
            "district": f"D{_rnd(h, i, 12)}",
            "outage_reported": {
                "customersAffected": 1 + _rnd(h, 5 + i, 90),
                "reportedAt": 1722470400000 + _rnd(h, 6 + i, 86400) * 1000,
            },
            "lat": 36.0 + _rnd(h, 7 + i, 900) / 1000.0,
            "lon": -86.5 + _rnd(h, 8 + i, 900) / 1000.0,
        }
        for i in range(1 + _rnd(h, 0, 6))
    ]
    return json.dumps({"incidents": incidents}).encode()


# -- LA3: alloutages minus extension/affectedAreas (la_scraper.py:40–74) ----------

def render_la3(url: str) -> bytes:
    h = _h(url)
    items = [
        {
            "id": f"L3-{h % 999}-{i}",
            "customersAffected": 1 + _rnd(h, 5 + i, 110),
            "cause": ["WEATHER", "EQUIPMENT", "UNKNOWN"][_rnd(h, 6 + i, 3)],
            "extension": {"x": 1},          # deleted by the parser (O30)
            "affectedAreas": [f"a{i}"],     # deleted by the parser (O30)
        }
        for i in range(1 + _rnd(h, 0, 5))
    ]
    return json.dumps(items).encode()


# -- MS7: reports[0/1].polygons (ms_scraper.py:41–74) -----------------------------

def render_ms7(url: str) -> bytes:
    h = _h(url)
    def polys(k):
        return [
            {"name": f"P{_rnd(h, k * 10 + i, 30)}",
             "affected": 0 if _rnd(h, k * 20 + i, 4) == 0 else _rnd(h, k * 30 + i, 130)}
            for i in range(2 + _rnd(h, k, 3))
        ]
    return json.dumps(
        {"reports": [{"polygons": polys(1)}, {"polygons": polys(2)}]}
    ).encode()


# -- MS10: two DOM ids → one row (ms_scraper.py:77–103) ---------------------------

def render_ms10(url: str) -> bytes:
    h = _h(url)
    return (
        "<html><body>"
        f'<span id="lblOutagesNow">{_rnd(h, 1, 500)}</span>'
        f'<span id="lblCustomersServed">{10000 + _rnd(h, 2, 90000)}</span>'
        "</body></html>"
    ).encode()


# -- IL1: stormcenter nested report (il_scraper.py:37–131) ------------------------
# cust_a is SOMETIMES a {val:int} wrapper and sometimes a bare int — the
# reference unwraps conditionally; the fixture exercises both shapes.

def render_il1(url: str) -> bytes:
    h = _h(url)
    kind = "zip" if url.endswith("report_zip.json") else "county"
    inner = [
        {
            "name": f"{kind.title()}{_rnd(h, i, 40)}",
            "cust_a": (
                {"val": _rnd(h, 10 + i, 500)} if _rnd(h, 20 + i, 2) else _rnd(h, 30 + i, 500)
            ),
            "n_out": 0 if _rnd(h, 40 + i, 4) == 0 else _rnd(h, 50 + i, 60),
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    return json.dumps({"file_data": {"areas": [{"areas": inner}]}}).encode()


# -- NY1: report_nyc/westchester XHR pair (ny_scraper.py:33–153) ----------------

def render_ny1(url: str) -> bytes:
    h = _h(url)
    kind = "borough" if url.endswith("report_nyc.json") else "area"
    rows = [
        {
            "name": f"{kind.title()}{_rnd(h, i, 20)}",
            "customersAffected": 0 if _rnd(h, 5 + i, 4) == 0 else _rnd(h, 6 + i, 400),
            "customersServed": 1000 + _rnd(h, 7 + i, 50000),
        }
        for i in range(2 + _rnd(h, 0, 4))
    ]
    return json.dumps({"rows": rows}).encode()


# -- TN2: reportTable HTML per dropdown level (tn_scraper.py:38–110) -------------

def render_tn2(url: str) -> bytes:
    h = _h(url)
    rows = "".join(
        f"<tr><td>Area{_rnd(h, i, 40)}</td>"
        f"<td>{0 if _rnd(h, 6 + i, 3) == 0 else _rnd(h, 7 + i, 120)}</td>"
        f"<td>{300 + _rnd(h, 8 + i, 4000)}</td></tr>"
        for i in range(2 + _rnd(h, 1, 5))
    )
    return (
        '<html><body><table id="reportTable">'
        "<tr><th>Name</th><th>Aff</th><th>Served</th></tr>"
        f"{rows}</table></body></html>"
    ).encode()


# -- NC7: treegrid DOM rows (nc_scraper.py:151–259) -------------------------------

def render_nc7(url: str) -> bytes:
    h = _h(url)
    rows = "".join(
        f'<tr class="treegrid"><td class="area_name">County{_rnd(h, i, 25)}</td>'
        f'<td class="cust_a">{0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 200)}</td>'
        f'<td class="cust_s">{500 + _rnd(h, 7 + i, 9000)}</td></tr>'
        for i in range(2 + _rnd(h, 0, 5))
    )
    return f"<html><body><table><tr><th>area_name</th><th>cust_a</th><th>cust_s</th></tr>{rows}</table></body></html>".encode()


# -- NC6: Duke 5-column summary table (nc_scraper.py:23–143 / fl_scraper.py:357) --

def render_nc6(url: str) -> bytes:
    h = _h(url)
    rows = "".join(
        f'<tr><td>Area{_rnd(h, i, 25)}</td>'
        f"<td>{0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 40)}</td>"
        f"<td>{_rnd(h, 7 + i, 900)}</td>"
        f"<td>{_rnd(h, 8 + i, 100)}%</td>"
        f"<td>2024-01-0{1 + _rnd(h, 9 + i, 9)}</td></tr>"
        for i in range(2 + _rnd(h, 0, 5))
    )
    return (
        "<html><body><table><tr><th>Location</th><th>Number of Outages</th>"
        "<th>Affected Customers</th><th>Percentage Affected</th>"
        f"<th>Last Updated</th></tr>{rows}</table></body></html>"
    ).encode()


# -- FL9: Duke clicked-through outage summary (fl_scraper.py:357–485) --------

def render_fl9(url: str) -> bytes:
    """POST-click Duke outage-summary DOM: the jurisdiction/summary
    click-through is browser-scope (SURVEY O5), so the fixture captures the
    DOM *after* Scraper9's three clicks — div rows and span cells carrying
    the exact class names the reference selects on (fl_scraper.py:462–467).
    Same per-url values as render_nc6: fl:8 and nc:6 scrape the same Duke
    widget through different DOMs, and the twin test asserts record-level
    equality between the two parses."""
    h = _h(url)
    rows = "".join(
        '<div class="outage-summary-table-content-row">'
        f'<span class="outage-summary-table-content-body-item">Area{_rnd(h, i, 25)}</span>'
        f'<span class="outage-summary-table-content-body-item">{0 if _rnd(h, 5 + i, 3) == 0 else _rnd(h, 6 + i, 40)}</span>'
        f'<span class="outage-summary-table-content-body-item">{_rnd(h, 7 + i, 900)}</span>'
        f'<span class="outage-summary-table-content-body-item"><span>{_rnd(h, 8 + i, 100)}%</span></span>'
        f'<span class="outage-summary-table-content-body-item">2024-01-0{1 + _rnd(h, 9 + i, 9)}</span>'
        "</div>"
        for i in range(2 + _rnd(h, 0, 5))
    )
    return (
        "<html><body><app-root><outage-home><section><county-panel>"
        '<h3 class="maps-panel-title">Report &amp; View Outages</h3>'
        '<div class="outage-summary-table-content">'
        '<div class="outage-summary-table-header-row">'
        '<span class="outage-summary-table-header-item">Location</span>'
        '<span class="outage-summary-table-header-item">Number of Outages</span>'
        '<span class="outage-summary-table-header-item">Affected Customers</span>'
        '<span class="outage-summary-table-header-item">Percentage Affected</span>'
        '<span class="outage-summary-table-header-item">Last Updated</span>'
        "</div>"
        f"{rows}</div></county-panel></section></outage-home></app-root></body></html>"
    ).encode()


# -- NY3: iframe county table + URL-templated town pages (ny_scraper.py:230–313)

def ny3_counties(url: str) -> list[str]:
    h = _h(url)
    return [f"Cnty{_rnd(h, 500 + i, 30)}" for i in range(2 + _rnd(h, 501, 3))]


def render_ny3_county(url: str) -> bytes:
    rows = "".join(
        f"<tr><td>{c}</td><td>{_rnd(_h(url), 600 + i, 150)}</td></tr>"
        for i, c in enumerate(ny3_counties(url))
    )
    return (
        "<html><body><table><tr><td>nav</td></tr></table>"
        "<table><tr><th>County</th><th>Customers Affected</th></tr>"
        f"{rows}<tr><td>footer</td><td></td></tr></table></body></html>"
    ).encode()


def render_ny3_town(url: str) -> bytes:
    h = _h(url)
    rows = "".join(
        f"<tr><td>Town{_rnd(h, 700 + i, 80)}</td><td>{_rnd(h, 800 + i, 90)}</td></tr>"
        for i in range(2 + _rnd(h, 801, 4))
    )
    return (
        "<html><body><table><tr><td>nav</td></tr></table>"
        "<table><tr><th>Town</th><th>Customers Affected</th></tr>"
        f"{rows}<tr><td>footer</td><td></td></tr></table></body></html>"
    ).encode()


# -- cc: Common-Crawl-style page (bench family) -------------------------------
# Multi-KB HTML with nav/boilerplate + paragraphs of deterministic text;
# the parser extracts the text (the byte-identical-per-url target for web
# pages per BASELINE.json input_hint). This is the payload shape the
# 10^10-URL synthetic frontier serves.

_CC_VOCAB = [
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
    "power", "outage", "grid", "county", "storm", "crew", "restore",
    "service", "customer", "report", "area", "line", "update", "estimated",
    "affected", "utility", "energy", "electric", "network", "data",
    "page", "system", "status", "region", "zone", "local", "public",
    "safety", "weather", "wind", "damage", "repair", "schedule", "night",
    "morning", "crews", "working", "expect", "hours", "thousand",
]


_CC_NAV = "".join(f'<a href="/nav/{i}">section {i}</a>' for i in range(10))
_CC_WORDBLOB: list[str] | None = None


def _cc_wordblob() -> list[str]:
    """64 precomputed 80-word sentence strings drawn from the vocab with
    the engine's own hash stream (deterministic, built once per process).
    render_cc composes pages out of these blocks — the payload generator
    is the bench's stand-in for the NETWORK, not engine work, so its CPU
    cost is kept to ~O(page bytes) string copies (the old per-word hash
    loop was 63%% of the crawl bench's Python time, drowning the actual
    fetch+parse engine path it is supposed to feed)."""
    global _CC_WORDBLOB
    if _CC_WORDBLOB is None:
        h = _h("cc-wordblob")
        n = 64 * 80
        words = [_CC_VOCAB[_rnd(h, i, len(_CC_VOCAB))] for i in range(n)]
        _CC_WORDBLOB = [
            " ".join(words[p : p + 80]) for p in range(0, n, 80)
        ]
    return _CC_WORDBLOB


def render_cc(url: str, n_words: int = 1200) -> bytes:
    h = _h(url)
    nw = n_words // 2 + _rnd(h, 0, n_words)
    blob = _cc_wordblob()
    # per-URL page: a hash-rotated selection of sentence blocks plus one
    # per-URL unique lead sentence, so pages differ (and dedup/seen logic
    # sees distinct text) while generation stays ~O(bytes)
    n_paras = max(nw // 80, 1)
    start = _rnd(h, 1, len(blob))
    paras = [
        f"<p>page {h & 0xFFFF} sector {_rnd(h, 2, 10_000)} report.</p>"
    ]
    for p in range(n_paras):
        paras.append("<p>" + blob[(start + p) % len(blob)] + ".</p>")
    return (
        "<html><head><title>page</title><style>.x{color:red}</style>"
        "<script>var t=1;</script></head><body>"
        f'<div class="nav">{_CC_NAV}</div><article>' + "\n".join(paras) + "</article>"
        '<footer>generated fixture page</footer></body></html>'
    ).encode()


_CCL_RE = re.compile(r"^https://h(\d+)\.synth-utility\.net/(outages|ln1|ln2)/.*/w(\d+)/$")


def ccl_child_urls(url: str) -> list[str]:
    """Deterministic cross-host outlinks for the LINKED synthetic web
    family (ccl): the real host graph the crawl-soak's PageRank
    reprioritization runs on. Seed pages (/outages/) link out 1/8 of
    the time, first-hop pages (/ln1/) 1/4, second-hop pages (/ln2/)
    never — a bounded two-hop web. Destination hosts are drawn
    log-uniformly over the SAME host space as the seed generator (the
    w{H} path segment carries the host count), so in-degree is
    Zipf-skewed and popular hosts accumulate rank. The child path
    embeds the parent's host rank (/ln1/{src}/...), making the
    host-graph edge list a pure projection of the frontier — no join
    to recover referrers."""
    m = _CCL_RE.match(url)
    if m is None:
        return []
    src_rank, seg, n_hosts = int(m.group(1)), m.group(2), int(m.group(3))
    if seg == "ln2" or n_hosts < 1:
        return []
    h = _h(url)
    gate = 8 if seg == "outages" else 4
    if h % gate:
        return []
    nxt = "ln1" if seg == "outages" else "ln2"
    out = []
    for i in range(2 + _rnd(h, 1, 2)):  # 2-3 outlinks
        u = _rnd(h, 10 + i, 1_000_000) / 1_000_000.0
        dst = max(int(math.exp(u * math.log(float(n_hosts)))) - 1, 0)
        out.append(
            f"https://h{dst}.synth-utility.net/{nxt}/{src_rank}/"
            f"{_rnd(h, 50 + i, 1_000_000)}/w{n_hosts}/"
        )
    return out


def render_ccl(url: str, n_words: int = 1200) -> bytes:
    """Linked variant of the cc page: same boilerplate + article body,
    plus an outlinks div (class=xlink anchors in discovery order)."""
    links = "".join(
        f'<a class="xlink" href="{c}">ref</a>' for c in ccl_child_urls(url)
    )
    page = render_cc(url, n_words).decode()
    return page.replace(
        '<footer>', f'<div class="links">{links}</div><footer>', 1
    ).encode()


# endpoint URL suffixes for families whose one seed fans out into several
# fetches (O29, e.g. ga_scraper.py:256–266, tx_scraper.py:103–114,
# ga_scraper.py:744–850). Order = the reference's fetch order, which the
# frontier encodes as child_seq.
FAMILY_ENDPOINTS: dict[str, list[str]] = {
    "ga1": ["data/boundaries.json", "data/outages.json"],
    "tx4": ["zip", "county"],
    "tx1": ["report-county.html", "report-zip.html"],
    "ga11": ["shellout/subs.json", "shellout/county.json", "shellout/outages.json"],
    "il7": ["city.json", "county.json", "metro.json"],
    "ny1": ["report_nyc.json", "report_westchester.json"],
    "tn2": ["report/county", "report/district"],
    "il1": ["report_county.json", "report_zip.json"],
    # ny3's single endpoint is the iframe's county table page; town pages
    # are discovered from it by URL templating
    "ny3": ["/towns.html"],
}

FAMILY_RENDERERS: dict[str, callable] = {
    "ga1_boundaries": render_ga1_boundaries,
    "ga1_outages": render_ga1_outages,
    "ga2": render_ga2,
    "ga3": render_ga3,
    "kubra_anchor": render_kubra_anchor,
    "kubra_report": render_kubra_report,
    "ga5": render_ga5,
    "ga6": render_ga6,
    "ga7": render_ga7,
    "ga9_landing": render_ga9_landing,
    "ga9_table": render_ga9_table,
    "ga10": render_ga10,
    "ga11_subs": render_ga11_subs,
    "ga11_county": render_ga11_county,
    "ga11_outages": render_ga11_outages,
    "tx1": render_tx1,
    "tx4": render_tx4,
    "tx6": render_tx6,
    "tx7": render_tx7,
    "tx10": render_tx10,
    "tn5": render_tn5,
    "tn7": render_tn7,
    "fl1": render_fl1,
    "fl3": render_fl3,
    "fl5": render_fl5,
    "fl7": render_fl7,
    "fl13": render_fl13,
    "il7": render_il7,
    "il8": render_il8,
    "la3": render_la3,
    "ms7": render_ms7,
    "ms10": render_ms10,
    "ny1": render_ny1,
    "tn2": render_tn2,
    "nc7": render_nc7,
    "nc6": render_nc6,
    "fl9": render_fl9,
    # tx5 reports share the kubra payload shape; the file_title keyword is
    # what parse_tx5_report's content probes classify on
    "tx5_report": render_kubra_report,
    "il1": render_il1,
    "ny3_county": render_ny3_county,
    "ny3_town": render_ny3_town,
    "ca_inv": render_ca_inv,
    "cc": render_cc,
    "ccl": render_ccl,
}


def endpoint_kind(url: str, family: str) -> str:
    """Resolve the concrete renderer/parser kind for a URL of a family."""
    if family == "ga1":
        return "ga1_boundaries" if url.endswith("boundaries.json") else "ga1_outages"
    if family == "kubra":
        return "kubra_report" if "report-" in url else "kubra_anchor"
    if family == "tx5":
        # same two-hop anchor page as kubra; only the report parse differs
        return "tx5_report" if "report-" in url else "kubra_anchor"
    if family == "ga11":
        for suffix in ("subs", "county", "outages"):
            if url.endswith(f"{suffix}.json"):
                return f"ga11_{suffix}"
        return "ga11_outages"
    if family == "ga9":
        return "ga9_table" if "level=" in url else "ga9_landing"
    if family == "ny3":
        # seed ends …/towns.html; town pages have the county name spliced
        # in before the extension (ny_scraper.py:308–310)
        return "ny3_county" if url.endswith("/towns.html") else "ny3_town"
    return family


def render(url: str, family: str) -> bytes:
    return FAMILY_RENDERERS[endpoint_kind(url, family)](url)


def make_fixture_fetcher():
    """FetchFn serving deterministic payloads by (url, family).
    Unknown families 404 — exercising the failure side-output (O23)."""

    def fetch(url: str, family: str | None):
        if family is None or (
            family != "kubra" and endpoint_kind(url, family) not in FAMILY_RENDERERS
        ):
            return 404, "unknown family", None
        return 200, None, render(url, family)

    return fetch
