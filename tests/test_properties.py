"""Property-based tests (hypothesis) for the engine's pure kernels and
column functions."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from outage_data_scraper_spark.frontier.seen import BloomFilter
from outage_data_scraper_spark.parsers.html_table import extract_tables, table_records

# -- Bloom filter: no false negatives, merge = union ---------------------------

hash_pairs = st.lists(
    st.tuples(st.integers(-(2**63), 2**63 - 1), st.integers(-(2**63), 2**63 - 1)),
    min_size=0, max_size=200,
)


@given(hash_pairs, hash_pairs)
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives_and_merge_is_union(a, b):
    bf1 = BloomFilter.sized(max(len(a), 1), 1e-3)
    bf2 = BloomFilter(bf1.m, bf1.k)
    if a:
        h1, h2 = np.array([x for x, _ in a]), np.array([y for _, y in a])
        bf1.add_hashes(h1, h2)
        assert bf1.contains_hashes(h1, h2).all()
    if b:
        h1b, h2b = np.array([x for x, _ in b]), np.array([y for _, y in b])
        bf2.add_hashes(h1b, h2b)
    merged = bf1.merge(bf2)
    for items in (a, b):
        if items:
            h1m = np.array([x for x, _ in items])
            h2m = np.array([y for _, y in items])
            assert merged.contains_hashes(h1m, h2m).all()


@given(hash_pairs)
@settings(max_examples=30, deadline=None)
def test_bloom_bytes_roundtrip(a):
    bf = BloomFilter.sized(max(len(a), 1))
    if a:
        bf.add_hashes(np.array([x for x, _ in a]), np.array([y for _, y in a]))
    back = BloomFilter.from_bytes(bf.m, bf.k, bf.to_bytes())
    assert (back.bits == bf.bits).all()


# -- HTML table extraction: header-driven records hold shape --------------------

cell = st.text(alphabet=st.characters(blacklist_characters="<>&", codec="ascii"), max_size=10)


@given(
    st.lists(cell, min_size=1, max_size=5),  # header
    st.lists(st.lists(cell, min_size=1, max_size=5), min_size=0, max_size=8),  # rows
)
@settings(max_examples=60, deadline=None)
def test_table_records_shape(header, rows):
    html = "<table><tr>" + "".join(f"<th>{h}</th>" for h in header) + "</tr>"
    for r in rows:
        html += "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>"
    html += "</table>"
    tables = extract_tables(html)
    assert len(tables) == 1
    recs = table_records(tables[0])
    keep = [h for h in (h.strip() for h in header) if h]
    for rec in recs:
        assert set(rec) == set(keep)


# -- URL canonicalization: idempotent, host stable (one Spark job per example) --

url_st = st.builds(
    lambda scheme, host, port, path, frag: f"{scheme}://{host}{port}{path}{frag}",
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
    st.sampled_from(["", ":89", ":8080"]),
    st.sampled_from(["", "/", "/A/b?q=Z", "/x%20y"]),
    st.sampled_from(["", "#frag", "#a#b"]),
)


@given(st.lists(url_st, min_size=1, max_size=60, unique=True))
@settings(max_examples=8, deadline=None)
def test_canonicalize_idempotent(spark, urls):
    from pyspark.sql import functions as F

    from outage_data_scraper_spark.functions import urlkit

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        urlkit.canonicalize(F.col("url")).alias("c1"),
        urlkit.canonicalize(urlkit.canonicalize(F.col("url"))).alias("c2"),
        urlkit.host(F.col("url")).alias("h1"),
        urlkit.host(urlkit.canonicalize(F.col("url"))).alias("h2"),
    ).collect()
    for r in out:
        assert r.c1 == r.c2
        assert r.h1 == r.h2
        assert "#" not in r.c1
