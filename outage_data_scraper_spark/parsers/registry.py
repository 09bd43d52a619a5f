"""Scraper dispatch: (state, layout) → site family (SURVEY.md O3).

Replaces the reference's factory-class chain (app/scrapers/scraper.py:15–43
plus per-state factories, e.g. ga_scraper.py:853–881) with a plain lookup
table used as a dispatch *column* — the parse stage routes each fetched
row to its family parser by this value, so dispatch is data, not code.

Only families implemented engine-side are mapped; the full reference
coverage table lives in SURVEY.md §2.2 and grows here family by family.
"""

from __future__ import annotations

# (state, layout) → family key in parsers.families / sources.fixtures
FAMILY_BY_STATE_LAYOUT: dict[tuple[str, str], str] = {
    # GA1 family reuse set (SURVEY.md §2.2 row GA1)
    ("ga", "1"): "ga1",
    ("tx", "8"): "ga1",
    ("tx", "17"): "ga1",
    ("fl", "1"): "ga1",
    ("nc", "1"): "ga1",
    ("la", "1"): "ga1",
    ("ms", "1"): "ga1",
    ("al", "1"): "ga1",
    ("sc", "1"): "ga1",
    ("il", "4"): "ga1",
    # GA3 (XML) reuse set
    ("ga", "3"): "ga3",
    ("tx", "16"): "ga3",
    ("fl", "12"): "ga3",
    ("il", "5"): "ga3",
    ("nc", "3"): "ga3",
    ("ms", "3"): "ga3",
    ("al", "4"): "ga3",
    ("sc", "5"): "ga3",
    # kubra two-hop reuse set
    ("ga", "4"): "kubra",
    ("fl", "3"): "kubra",
    ("ms", "4"): "kubra",
    ("al", "3"): "kubra",
    ("sc", "6"): "kubra",
    ("tx", "19"): "kubra",
    # GA9 HTML tables reuse set
    ("ga", "9"): "ga9",
    ("tx", "11"): "ga9",
    ("fl", "2"): "ga9",
    ("il", "3"): "ga9",
    ("nc", "2"): "ga9",
    ("la", "2"): "ga9",
    ("ms", "5"): "ga9",
    ("al", "2"): "ga9",
    ("sc", "2"): "ga9",
    ("tn", "4"): "ga9",
    # TX4
    ("tx", "4"): "tx4",
    ("la", "5"): "tx4",
    ("ms", "8"): "tx4",
    # GA2 / GA5 / GA6 / GA7 / GA10 / GA11 reuse sets (SURVEY.md §2.2)
    ("ga", "2"): "ga2",
    ("ga", "5"): "ga5",
    ("fl", "5"): "ga5",
    ("tn", "6"): "ga5",
    ("ga", "6"): "ga6",
    ("tx", "13"): "ga6",
    ("nc", "5"): "ga6",
    ("ga", "7"): "ga7",
    ("nc", "4"): "ga7",
    ("ga", "10"): "ga10",
    ("ga", "11"): "ga11",
    ("tx", "12"): "ga11",
    ("fl", "4"): "ga11",
    ("il", "6"): "ga11",
    ("tn", "1"): "ga11",
    ("ms", "2"): "ga11",
    ("al", "5"): "ga11",
    ("sc", "3"): "ga11",
    # TX singles
    ("tx", "1"): "tx1",
    ("la", "7"): "tx1",
    ("tx", "5"): "tx5",  # kubra-variant, keeps all columns (tx_scraper.py:117)
    ("sc", "4"): "tx5",  # Dominion SC (sc_scraper.py:50–51 → TX_Scraper5)
    ("tn", "3"): "ga1",  # tn_scraper.py:236–237 → GA_Scraper1 (13 EMCs)
    ("tx", "6"): "tx6",
    ("tx", "7"): "tx7",
    ("tx", "10"): "tx10",
    # FL singles
    ("fl", "8"): "fl9",  # Duke clicked-through summary DOM (fl_scraper.py:357–485)
    ("fl", "6"): "fl1",
    ("fl", "7"): "fl3",
    ("fl", "9"): "fl5",
    ("fl", "11"): "fl7",
    # IL stormcenter
    ("il", "1"): "il1",
    ("il", "2"): "kubra",
    ("ny", "2"): "kubra",
    # NY / NC
    ("ny", "1"): "ny1",
    ("ny", "3"): "ny3",
    ("nc", "7"): "nc7",
    ("nc", "6"): "nc6",  # Duke 5-col summary (nc_scraper.py:23; no-op zero filter)
    ("tn", "2"): "tn2",
    # IL / TN / LA / MS singles
    ("il", "7"): "il7",
    ("il", "8"): "il8",
    ("tn", "5"): "tn5",
    ("la", "3"): "la3",
    ("la", "6"): "la3",
    ("ms", "7"): "ms7",
    ("ms", "10"): "ms10",
    # TN7 / FL13 / CA investor
    ("tn", "7"): "tn7",
    ("fl", "13"): "fl13",
    ("tn", "8"): "fl13",
    ("ca", "investor"): "ca_inv",
    ("ca", "paloalto"): "ga1",
    # bench family: Common-Crawl-style text pages (synthetic frontier)
    ("cc", "0"): "cc",
    # linked variant: cc pages with deterministic cross-host outlinks —
    # the host graph the PageRank-reprioritized crawl soak runs on
    ("cc", "1"): "ccl",
}


def family_for(state: str, layout: str) -> str | None:
    return FAMILY_BY_STATE_LAYOUT.get((state, str(layout)))
