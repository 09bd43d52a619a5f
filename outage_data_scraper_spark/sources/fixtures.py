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


def render_ga9(url: str) -> bytes:
    h = _h(url)
    rows = "".join(
        f"<tr><td>Zone{_rnd(h, i, 60)}</td>"
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


def render_cc(url: str, n_words: int = 1200) -> bytes:
    h = _h(url)
    nw = n_words // 2 + _rnd(h, 0, n_words)
    words = [_CC_VOCAB[_rnd(h, 1000 + i, len(_CC_VOCAB))] for i in range(nw)]
    paras = []
    step = 80
    for p in range(0, nw, step):
        paras.append("<p>" + " ".join(words[p : p + step]) + ".</p>")
    nav = "".join(f'<a href="/nav/{i}">section {i}</a>' for i in range(10))
    return (
        "<html><head><title>page</title><style>.x{color:red}</style>"
        "<script>var t=1;</script></head><body>"
        f'<div class="nav">{nav}</div><article>' + "\n".join(paras) + "</article>"
        '<footer>generated fixture page</footer></body></html>'
    ).encode()


# endpoint suffix → renderer for families whose seed fans out (O29)
FAMILY_ENDPOINTS: dict[str, list[tuple[str, callable]]] = {
    "ga1": [
        ("data/boundaries.json", render_ga1_boundaries),
        ("data/outages.json", render_ga1_outages),
    ],
}

FAMILY_RENDERERS: dict[str, callable] = {
    "ga1_boundaries": render_ga1_boundaries,
    "ga1_outages": render_ga1_outages,
    "ga3": render_ga3,
    "kubra_anchor": render_kubra_anchor,
    "kubra_report": render_kubra_report,
    "ga9": render_ga9,
    "tx4": render_tx4,
    "tn7": render_tn7,
    "fl13": render_fl13,
    "ca_inv": render_ca_inv,
    "cc": render_cc,
}


def endpoint_kind(url: str, family: str) -> str:
    """Resolve the concrete renderer/parser kind for a URL of a family."""
    if family == "ga1":
        return "ga1_boundaries" if url.endswith("boundaries.json") else "ga1_outages"
    if family == "kubra":
        return "kubra_report" if "report-" in url else "kubra_anchor"
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
