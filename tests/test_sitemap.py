"""Sitemap discovery source tests (sources/sitemap.py)."""

import gzip
import os

from pyspark.sql import functions as F

from outage_data_scraper_spark.sources import sitemap

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>http://s.example.com/a</loc><lastmod>2024-03-01</lastmod>
       <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>http://s.example.com/b</loc><priority>0.3</priority></url>
  <url><loc>http://s.example.com/c</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = f"""<?xml version="1.0"?>
<sitemapindex {NS}>
  <sitemap><loc>http://s.example.com/sitemap-1.xml</loc></sitemap>
  <sitemap><loc>http://s.example.com/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index():
    rows = sitemap.parse_sitemap(URLSET.encode())
    assert [r["url"] for r in rows] == [
        "http://s.example.com/a", "http://s.example.com/b", "http://s.example.com/c"
    ]  # loc-less entry dropped
    assert rows[0]["sm_priority"] == 0.9 and rows[0]["changefreq"] == "daily"
    assert rows[2]["sm_priority"] is None
    assert [r["pos"] for r in rows] == [0, 1, 2]
    idx = sitemap.parse_sitemap(INDEX.encode())
    assert [r["kind"] for r in idx] == ["sitemap", "sitemap"]
    assert idx[1]["url"].endswith("sitemap-2.xml.gz")


def test_parse_gzip_and_malformed():
    rows = sitemap.parse_sitemap(gzip.compress(URLSET.encode()))
    assert len(rows) == 3
    assert sitemap.parse_sitemap(b"<html>not a sitemap</html>") == []
    assert sitemap.parse_sitemap(b"\x1f\x8btruncated-gzip") == []
    assert sitemap.parse_sitemap(b"<urlset><url><loc>x</loc>") == []  # bad XML


def test_frontier_rows_pop_in_priority_then_document_order(spark, tmp_path):
    d = str(tmp_path / "maps")
    os.makedirs(d)
    with open(os.path.join(d, "sm.xml"), "w") as f:
        f.write(URLSET)
    with open(os.path.join(d, "idx.xml"), "w") as f:
        f.write(INDEX)
    entries = sitemap.read_sitemaps(spark, d)
    assert entries.filter(F.col("kind") == "sitemap").count() == 2
    frontier = sitemap.frontier_rows_from_sitemap(entries)
    rows = frontier.collect()
    assert len(rows) == 3
    # frontier schema parity: pop_wave runs on it directly
    from outage_data_scraper_spark.frontier.priority import pop_wave

    popped = pop_wave(frontier, per_host_k=3, num_parts=2).collect()
    order = [r.url for r in sorted(popped, key=lambda r: (r.priority, r.seed_seq))]
    # 0.9-priority page first (law pops ascending on negated hint),
    # then the default-0.5 loc-only page in DOCUMENT order, then 0.3
    assert order == [
        "http://s.example.com/a", "http://s.example.com/c", "http://s.example.com/b"
    ]


def test_cross_file_seed_seq_is_a_total_order(spark, tmp_path):
    """Two files with identical default-priority entries must still get
    DISTINCT (priority, event_seq, seed_seq, ...) keys — per-file
    numbering would tie the ordering law across files and make pop
    order nondeterministic."""
    d = str(tmp_path / "maps")
    os.makedirs(d)
    doc = f'<urlset {NS}><url><loc>http://HOST/p</loc></url></urlset>'
    with open(os.path.join(d, "a.xml"), "w") as f:
        f.write(doc.replace("HOST", "h1.com"))
    with open(os.path.join(d, "b.xml"), "w") as f:
        f.write(doc.replace("HOST", "h2.com"))
    frontier = sitemap.frontier_rows_from_sitemap(sitemap.read_sitemaps(spark, d))
    rows = frontier.collect()
    keys = {(r.priority, r.event_seq, r.seed_seq, r.depth, r.child_seq) for r in rows}
    assert len(keys) == len(rows) == 2  # no ties anywhere
    # and stable across evaluations
    again = {r.url: r.seed_seq for r in frontier.collect()}
    assert again == {r.url: r.seed_seq for r in rows}
