"""Stdlib HTML table extraction for the HTML-table site families
(GA9/TX1/TN2/NY3 pattern, reference: ga_scraper.py:614–645).

No bs4/lxml dependency: the payloads the engine parses are captured table
markup, and a strict stdlib HTMLParser keeps the container dependency-free.
Runs inside Arrow batches (pandas UDF), never per-row at the Spark level.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _TableParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.tables.append([])
        elif tag == "tr" and self.tables:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell is not None and self._row is not None:
            self._row.append("".join(self._cell).strip())
            self._cell = None
        elif tag == "tr" and self._row is not None:
            self.tables[-1].append(self._row)
            self._row = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def extract_tables(html: str) -> list[list[list[str]]]:
    """All tables as row-lists of stripped cell text."""
    p = _TableParser()
    p.feed(html)
    return p.tables


def table_records(table: list[list[str]]) -> list[dict]:
    """Header row (first row) → dicts; blank header columns dropped and
    rows shorter than the header padded — mirrors the reference's
    header-driven dynamic columns + dropna (ga_scraper.py:626–645)."""
    if not table:
        return []
    header = table[0]
    keep = [i for i, hcell in enumerate(header) if hcell]
    out = []
    for row in table[1:]:
        if not any(c for c in row):
            continue
        rec = {}
        complete = True
        for i in keep:
            v = row[i] if i < len(row) else None
            if v is None:
                complete = False
                break
            rec[header[i]] = v
        if complete:
            out.append(rec)
    return out
