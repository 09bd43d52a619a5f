"""Parser-family golden/semantic tests (SURVEY.md §5.1).

Each family parser is checked against an independent re-statement of the
reference semantics (filters, unwraps, type-preserving zero comparisons)
on the deterministic fixture payloads — including the load-bearing
string-vs-int zero distinction (SURVEY.md §1.2).
"""

import json

import pandas as pd

from outage_data_scraper_spark.parsers import families
from outage_data_scraper_spark.sources import fixtures


def test_ga1_boundaries_filter_matches_pandas_semantics():
    url = "https://u1.fixture-utility.com/outages/1/data/boundaries.json"
    payload = fixtures.render_ga1_boundaries(url)
    levels, children = families.parse_ga1_boundaries(payload)
    assert children == []
    # independent pandas re-statement of ga_scraper.py:223–230
    items = json.loads(payload)
    df = pd.DataFrame([b for it in items for b in it["boundaries"]])
    expect = df[(df["customersAffected"] != 0) | (df["customersOutNow"] != 0)]
    assert levels["per_county"] == expect.to_dict("records")


def test_ga1_outages_zip_guard():
    # find a URL whose outage list crosses the <10 guard each way
    small = big = None
    for i in range(60):
        url = f"https://probe{i}.example/outages/data/outages.json"
        n = len(json.loads(fixtures.render_ga1_outages(url)))
        if n < 10 and small is None:
            small = url
        if n >= 10 and big is None:
            big = url
    assert small and big
    lv_small, _ = families.parse_ga1_outages(fixtures.render_ga1_outages(small))
    assert all(o["zip"] != families.ZIP_GUARD_SENTINEL for o in lv_small["per_outage"])
    lv_big, _ = families.parse_ga1_outages(fixtures.render_ga1_outages(big))
    assert all(o["zip"] == families.ZIP_GUARD_SENTINEL for o in lv_big["per_outage"])


def test_ga3_string_typed_zero_and_shape_drop():
    payload = fixtures.render_ga3("https://x.example/asmx")
    levels, _ = families.parse_ga3(payload)
    for rec in levels["per_county"]:
        assert "Shape" not in rec
        assert rec["CustomersAffected"] != "0"  # string compare, not int
        assert isinstance(rec["CustomersAffected"], str)
    assert levels["per_outage"]  # outages kept unfiltered


def test_kubra_two_hop_and_level_routing():
    url = "https://k0.fixture-kubra.com/maps/0"
    levels, children = families.parse_kubra_anchor(fixtures.render_kubra_anchor(url))
    assert levels == {}
    assert children == fixtures.kubra_child_urls(url)
    assert len(children) == len(set(children))  # visited-dedup
    for child in children:
        lv, _ = families.parse_kubra_report(fixtures.render_kubra_report(child))
        level = next(iter(lv))
        kw = child.rsplit("report-", 1)[-1].split(".")[0]
        assert level == {"county": "per_county", "zip": "per_zipcode", "city": "per_city"}[kw]
        for rec in lv[level]:
            assert set(rec) == {"name", "cust_a", "percent_cust_a", "n_out"}
            assert rec["cust_a"] != 0 or rec["n_out"] != 0
            assert not isinstance(rec["cust_a"], dict)  # {val:…} unwrapped


def test_level_keyword_cascade_order():
    # order-sensitive: zip beats county beats city (O15)
    assert families.classify_level("zip_county_city") == "per_zipcode"
    assert families.classify_level("county_city") == "per_county"
    assert families.classify_level("CITY report") == "per_city"
    assert families.classify_level("other") == "per_unknown"


def test_ga9_dropdown_discovery_and_table_parse():
    url = "https://t.example/outages/"
    levels, children = families.parse_ga9_landing(fixtures.render_ga9_landing(url), url)
    assert levels == {}
    assert children == [f"{url}?level={lv}" for lv in fixtures.ga9_levels(url)]
    for child in children:
        lv, _ = families.parse_ga9_table(fixtures.render_ga9_table(child), child)
        level = f"per_{child.rsplit('level=', 1)[-1]}"
        assert level in lv
        for rec in lv[level]:
            assert set(rec) == {"Name", "# Out", "# Served"}
            assert rec["# Out"] != "0"  # string-typed (ga_scraper.py:641)


def test_tx4_ms_epoch_and_int_zero_filter():
    payload = fixtures.render_tx4("https://t.example/county")
    levels, _ = families.parse_tx4(payload)
    for rec in levels["per_county"]:
        assert rec["customersAffected"] != 0
        # ms epoch converted to wall string (tx_scraper.py:95–97)
        assert len(rec["lastUpdatedTime"]) == 19 and rec["lastUpdatedTime"][4] == "-"


def test_fl13_per_dataset_levels():
    levels, _ = families.parse_fl13(fixtures.render_fl13("https://f.example/region"))
    assert set(levels) == {"per_county", "per_zip"}
    for rows in levels.values():
        assert all(r["numberOut"] != 0 for r in rows)


def test_ca_inv_flatten_and_ms_casts():
    levels, _ = families.parse_ca_inv(fixtures.render_ca_inv("https://c.example/arcgis"))
    for rec in levels["per_outage"]:
        assert {"x", "y", "OBJECTID", "StartDate"} <= set(rec)
        assert rec["StartDate"][4] == "-"


def test_canonical_text_is_deterministic_bytes():
    url = "https://u2.fixture-utility.com/outages/2/data/boundaries.json"
    p = fixtures.render_ga1_boundaries(url)
    t1 = families.canonical_text(families.parse_ga1_boundaries(p)[0])
    t2 = families.canonical_text(families.parse_ga1_boundaries(p)[0])
    assert t1.encode() == t2.encode()
