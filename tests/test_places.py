"""Category-cascade goldens mirroring the reference's parser tests
(/root/reference/tests/test_gps.py:225-268) plus cascade branch coverage."""

import json

import pytest

from gscap_ray.functions.places import (
    GMAP_TYPE_MAP,
    gmapping,
    normalize_gmap_types,
    parse_gmap_response,
    parse_yelp_response,
)


def test_gmap_campground_golden():
    # reference mock_gmap_response: one result, name 'c', types ['campground']
    # -> rank 0 / 'campground' / 'lodging' (test_gps.py:261-268)
    c = json.dumps({"results": [{"name": "c", "types": ["campground"]}]})
    r = parse_gmap_response(c)
    assert r["rank_order"] == 0
    assert r["name"] == "c"
    assert r["categories"] == "campground"
    assert r["major_categories"] == "lodging"


def test_gmapping_golden():
    assert gmapping("campground") == {"lodging"}
    assert gmapping("no_such_type") == {"undefined category"}
    assert gmapping("Expecting value: line 1") == {"JSON Decode Error"}
    # duplicated key in the reference CSV: first occurrence wins
    assert GMAP_TYPE_MAP["travel_agency"] == "repair"


def test_gmap_skip_and_sentinels():
    # ignored-type result skipped; second result wins with its index
    c = json.dumps({"results": [
        {"name": "a", "types": ["locality", "political"]},
        {"name": "b", "types": ["museum"]}]})
    r = parse_gmap_response(c)
    assert (r["rank_order"], r["name"], r["major_categories"]) == \
        (1, "b", "entertainment")
    # all skipped -> not found
    c = json.dumps({"results": [{"name": "a", "types": ["country"]}]})
    assert parse_gmap_response(c)["name"] == "not found"
    # decode error sentinel
    r = parse_gmap_response("}{")
    assert r["major_categories"] == "JSONDecodeError"
    assert r["rank_order"] == -1
    # error-key sentinel
    r = parse_gmap_response(json.dumps({"error": "quota"}))
    assert (r["name"], r["major_categories"]) == ("quota", "none")
    # <a> tags stripped before parsing (gps.py:344)
    c = '{"results": [{"name": "<a href=x>c</a>", "types": ["campground"]}]}'
    assert parse_gmap_response(c)["name"] == "c"


@pytest.mark.parametrize("name,types,want_cats,want_major", [
    # cascade branches (gps.py:413-443)
    ("x", ["gas_station", "atm"], "gas_station", "automotive"),
    ("x", ["lodging", "spa"], "lodging", "lodging"),
    ("x", ["transit_station", "store"], "transit_station", "transit"),
    ("x", ["health", "doctor"], "health", "health"),
    ("x", ["store", "health", "doctor"], "health", "health"),
    ("x", ["health", "store"], "supermarket", "supermarket"),
    ("x", ["store", "finance"], "finance", "finance"),
    ("x", ["restaurant", "bar"], "bar", "entertainment"),
    ("x", ["restaurant"], "dining_out", "dining_out"),
    ("x", ["food", "store"], "supermarket", "supermarket"),
    ("x", ["store"], "store", "consumer_goods"),
    ("x", ["food"], "food", "dining_out"),
    ("Target", ["store", "department_store"], "department_store",
     "consumer_goods"),
    ("Fred Meyer", ["store"], "supermarket", "supermarket"),
    ("x", ["point_of_interest", "establishment"], "other", "other"),
    ("x", ["museum", "zoo"], "museum", "entertainment"),  # min() tiebreak
])
def test_gmap_cascade_branches(name, types, want_cats, want_major):
    cats, major = normalize_gmap_types(name, types)
    assert (cats, major) == (want_cats, want_major)


def test_yelp_golden_and_precedence():
    # reference golden: alias 3dprinting -> personal_services
    # (test_gps.py:228-241)
    c = json.dumps({"businesses": [
        {"name": "test", "categories": [{"alias": "3dprinting"}]}]})
    r = parse_yelp_response(c)
    assert r["name"] == "test"
    assert r["major_categories"] == "personal_services"
    # dining_out precedence over any other mapped major (gps.py:245-249)
    c = json.dumps({"businesses": [
        {"name": "m", "categories": [{"alias": "banks"}, {"alias": "pizza"}]}]})
    assert parse_yelp_response(c)["major_categories"] == "dining_out"
    # sentinels
    assert parse_yelp_response("nan")["name"] == "not found"
    assert parse_yelp_response("}{")["major_categories"] == "JSONDecodeError"
    with pytest.raises(TypeError):
        parse_yelp_response(1)


def test_yelp_full_table_loaded():
    # VERDICT r2 #4: the FULL 1540-row alias space must be live, not a
    # subset. 1539 data rows (header excluded) with first-wins dedup.
    from gscap_ray.functions.places import YELP_TYPE_MAP

    assert len(YELP_TYPE_MAP) >= 1500
    assert set(YELP_TYPE_MAP.values()) >= {
        "dining_out", "entertainment", "repair", "health", "consumer_goods",
        "personal_services", "home_store", "automotive", "education",
        "supermarket", "transit", "lodging", "finance",
        "government_offices", "other_organization", "place_of_worship",
        "place_of_mourning", "park"}


@pytest.mark.parametrize("alias,major", [
    # goldens OUTSIDE the pre-r3 subset (reference yelp table rows)
    ("absinthebars", "entertainment"),
    ("acupuncture", "health"),
    ("courthouses", "government_offices"),
    ("funeralservices", "place_of_mourning"),
    ("mortuaryservices", "place_of_mourning"),
    ("departmentsofmotorvehicles", "government_offices"),
    ("abruzzese", "dining_out"),
    ("accountants", "finance"),
])
def test_yelp_out_of_subset_goldens(alias, major):
    c = json.dumps({"businesses": [
        {"name": "x", "categories": [{"alias": alias}]}]})
    assert parse_yelp_response(c)["major_categories"] == major


def test_yelp_unknown_alias_defaults_undefined():
    # documented deviation: reference .loc raises KeyError on an unmapped
    # alias; the engine degrades to 'undefined category' (gmapping's rule)
    c = json.dumps({"businesses": [
        {"name": "x", "categories": [{"alias": "not-a-real-alias"}]}]})
    assert parse_yelp_response(c)["major_categories"] == "undefined category"


def test_place_normalize_matches_oracle(ray_session):
    import duckdb

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from check_correctness import compare, to_pandas

    from gscap_ray.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    ray_df = to_pandas(QUERIES["place_normalize"](sf))
    sql_df = con.sql(ORACLE_SQL["place_normalize"]).df()
    assert compare("place_normalize", ray_df, sql_df) is None
