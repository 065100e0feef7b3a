"""EAS SAME decoding (reference owrx/dsame3 behavioral equivalent)."""

from datetime import datetime, timezone

from openwebrx_tpu.services.eas import (
    decode_same, decode_area, severity_of, load_county_db,
)
from openwebrx_tpu.services.toolbox import EasParser

NOW = datetime(2026, 2, 25, 19, 45, tzinfo=timezone.utc)   # day 056


def test_tornado_warning_header():
    hdr = "ZCZC-WXR-TOR-048453+0100-0561930-KEWX/NWS-"
    d = decode_same(hdr, now=NOW)
    assert d["org"] == "WXR"
    assert d["org_text"] == "National Weather Service"
    assert d["event"] == "Tornado Warning"
    assert d["severity"] == "warning"
    assert d["duration_minutes"] == 60
    assert d["sender"] == "KEWX/NWS"
    a = d["areas"][0]
    assert a["state"] == "Texas"
    assert a["part"] == ""                     # P=0: whole county
    # no county DB: falls back to numbered area, everything else rendered
    assert "Texas" in d["text"]
    assert "Tornado Warning" in d["text"]
    assert "KEWX/NWS" in d["text"]
    assert d["start"].startswith("2026-02-25T19:30")
    assert d["end"].startswith("2026-02-25T20:30")


def test_county_db_lookup(tmp_path):
    p = tmp_path / "fips.csv"
    p.write_text("# code,name\n48453,Travis County\n48491,Williamson County\n")
    db = load_county_db(str(p))
    hdr = "ZCZC-WXR-SVR-048453-148491+0030-0561930-KEWX/NWS-"
    d = decode_same(hdr, db, now=NOW)
    assert d["areas"][0]["county"] == "Travis County"
    assert "Travis County, Texas" in d["text"]
    # P=1 → northwest part of the county
    assert d["areas"][1]["part"] == "northwest"
    assert "northwest Williamson County" in d["text"]


def test_statewide_and_marine_areas():
    a = decode_area("048000")
    assert a["text"] == "all of Texas"
    m = decode_area("075000")
    assert m["state"] == "Gulf of Mexico"


def test_required_weekly_test():
    hdr = "ZCZC-EAS-RWT-024031+0015-0561930-WABC/FM-"
    d = decode_same(hdr, now=NOW)
    assert d["severity"] == "test"
    assert d["event"] == "Required Weekly Test"
    assert d["duration_minutes"] == 15
    assert d["areas"][0]["state"] == "Maryland"


def test_year_boundary_day_of_year():
    # issued day 365 23:50, received Jan 1 → start must land in the PRIOR year
    now = datetime(2027, 1, 1, 0, 10, tzinfo=timezone.utc)
    d = decode_same("ZCZC-WXR-WSW-036001+0600-3652350-KALY/NWS-", now=now)
    assert d["start"].startswith("2026-12-31T23:50")


def test_severity_classes():
    assert severity_of("TOA") == "watch"
    assert severity_of("LAE") == "emergency"
    assert severity_of("FLS") == "statement"
    assert severity_of("CEM") == "emergency"  # civil emergency, special-cased
    assert severity_of("EAN") == "emergency"   # national activation outranks
    assert severity_of("EAT") == "emergency"   # the name-suffix heuristic
    assert severity_of("ADR") == "advisory"


def test_parser_emits_decoded_message():
    got = []
    parser = EasParser(got.append)
    parser.parse(b"EAS: ZCZC-CIV-CDW-006037+0100-0561930-KLAX/CIV-")
    parser.parse(b"EAS: NNNN")
    assert got[0]["mode"] == "EAS"
    assert got[0]["event"] == "Civil Danger Warning"
    assert got[0]["areas"][0]["state"] == "California"
    assert "Civil authorities" in got[0]["text"]
    assert got[1] == {"mode": "EAS", "eom": True}


def test_bundled_fips_table_names_counties():
    """Without eas_fips_path configured the parser falls back to the
    bundled census seed table — alerts name the county like the
    reference's vendored dsame3 output (owrx/dsame3/dsame.py:278)."""
    got = []
    parser = EasParser(got.append)
    assert parser._county_db, "bundled data/eas_fips.csv must load"
    parser.parse(b"EAS: ZCZC-WXR-TOR-006037-048201+0100-0561930-KLAX/NWS-")
    areas = got[0]["areas"]
    assert areas[0]["county"] == "Los Angeles"
    assert "Los Angeles, California" in got[0]["text"]
    assert areas[1]["county"] == "Harris"
    assert "Harris, Texas" in got[0]["text"]
