"""Shipped data packs (VERDICT r4 item 7): county-level SAME names,
regional bandplans, bookmarks.d equivalents."""

import json

import numpy as np
import pytest

from openwebrx_tpu.core.bands import (
    Bandplan, load_region, load_bands_file, REGIONS,
)
from openwebrx_tpu.core.bookmarks import Bookmarks
from openwebrx_tpu.core.config import Config
from openwebrx_tpu.services.eas import builtin_county_db, decode_same


class TestEasCounties:
    def test_builtin_db_covers_us(self):
        db = builtin_county_db()
        assert len(db) > 3000
        assert db["01001"] == "Autauga"
        assert db["06037"] == "Los Angeles"
        assert db["48201"] == "Harris"

    def test_county_coded_header_renders_county_name(self):
        d = decode_same("ZCZC-WXR-TOR-001001+0030-2771829-KEAX/NWS-")
        assert "Autauga, Alabama" in d["text"]
        # part-of-county prefix still applies
        d2 = decode_same("ZCZC-WXR-SVR-706037+0100-2771829-KLOX/NWS-")
        assert "southwest Los Angeles, California" in d2["text"]

    def test_unknown_code_falls_back(self):
        d = decode_same("ZCZC-WXR-TOR-001999+0030-2771829-KEAX/NWS-")
        assert "area 999 of Alabama" in d["text"]


class TestRegionalBands:
    def test_all_regions_load(self):
        for region in REGIONS:
            bands = load_region(region)
            assert len(bands) > 25
            names = {b.name for b in bands}
            assert "20m" in names and "FM bc" in names

    def test_regional_differences(self):
        """The data encodes the real ITU region differences."""
        def band(region, name):
            return next(b for b in load_region(region) if b.name == name)
        assert band("r1", "40m").high == 7200000
        assert band("r2", "40m").high == 7300000      # Americas phone seg
        assert band("r1", "80m").high == 3800000
        assert band("r2", "80m").high == 4000000
        assert band("r2", "2m").high == 148000000
        assert band("r1", "2m").high == 146000000
        r2_names = {b.name for b in load_region("r2")}
        assert "1.25m" in r2_names                     # region-2 only
        assert "1.25m" not in {b.name for b in load_region("r1")}
        r1_names = {b.name for b in load_region("r1")}
        assert "LW bc" in r1_names
        assert "LW bc" not in r2_names

    def test_config_selects_region(self):
        Config.reset()
        Config.get()["bandplan_region"] = "r2"
        try:
            plan = Bandplan()                          # fresh, not shared
            b40 = next(b for b in plan.bands if b.name == "40m")
            assert b40.high == 7300000
        finally:
            Config.reset()

    def test_dial_frequencies_survive_load(self):
        bands = load_region("r1")
        b20 = next(b for b in bands if b.name == "20m")
        dials = {d["mode"]: d["frequency"] for d in b20.get_dial_frequencies()}
        assert dials["ft8"] == 14074000


class TestBookmarkPacks:
    def test_packs_available(self):
        packs = Bookmarks.available_packs()
        assert {"aviation", "marine", "cb", "weather", "time"} <= set(packs)

    def test_config_merges_packs_read_only(self, tmp_path):
        Config.reset()
        Config.get()["bookmark_packs"] = ["marine", "time"]
        try:
            bm = Bookmarks(str(tmp_path / "bookmarks.json"))
            names = {b.name for b in bm.get_bookmarks()}
            assert "Marine ch 16 (distress)" in names
            assert "WWV" in names
            # packs are read-only: store() must not persist them
            bm.store()
            import os
            if os.path.exists(bm.path):
                saved = json.load(open(bm.path))
                assert all(s["name"] != "WWV" for s in saved)
        finally:
            Config.reset()

    def test_range_filter_includes_packs(self):
        Config.reset()
        Config.get()["bookmark_packs"] = "all"
        try:
            bm = Bookmarks(None)
            vhf = bm.get_bookmarks((156_000_000, 157_000_000))
            assert any(b.name.startswith("Marine ch 16") for b in vhf)
        finally:
            Config.reset()


class TestBandsApi:
    def test_api_serves_regional_plans(self):
        from openwebrx_tpu.web.server import build_router

        class FakeReq:
            method = "GET"
            path = "/api/bands"
            query = {"region": "r2"}
            headers = {}
        router = build_router()
        handler = router.route(FakeReq())
        body = handler(FakeReq())
        payload = json.loads(body.split(b"\r\n\r\n", 1)[1])
        assert payload["regions"] == ["r1", "r2", "r3"]
        b40 = next(b for b in payload["bands"] if b["name"] == "40m")
        assert b40["upper_bound"] == 7300000

    def test_api_active_plan_and_unknown_region(self):
        from openwebrx_tpu.web.server import build_router

        class FakeReq:
            method = "GET"
            path = "/api/bands"
            query = {}
            headers = {}
        router = build_router()
        handler = router.route(FakeReq())
        payload = json.loads(handler(FakeReq()).split(b"\r\n\r\n", 1)[1])
        assert any(b["name"] == "20m" for b in payload["bands"])

        class BadReq(FakeReq):
            query = {"region": "r9"}
        resp = handler(BadReq())
        assert b"404" in resp.split(b"\r\n", 1)[0]
