"""Toolbox + aircraft parser tests."""

import numpy as np

from openwebrx_tpu.services.aircraft import (
    AircraftCache, AcarsParser, AdsbParser, HfdlParser, Vdl2Parser,
    cpr_decode_global,
)
from openwebrx_tpu.services.toolbox import (
    EasParser, IsmParser, PageParser, RdsParser, SelCallParser,
)


class TestPageParser:
    def test_pocsag_alpha(self):
        out = []
        p = PageParser(out.append)
        p.parse(b"POCSAG1200: Address: 1234567  Function: 0  Alpha:   Hello page")
        assert out[0]["protocol"] == "POCSAG1200"
        assert out[0]["address"] == 1234567
        assert out[0]["message"] == "Hello page"

    def test_pocsag_tone_only(self):
        out = []
        PageParser(out.append).parse(b"POCSAG512: Address: 4242  Function: 2")
        assert out[0]["address"] == 4242
        assert "message" not in out[0]

    def test_flex(self):
        out = []
        p = PageParser(out.append)
        p.parse(b"FLEX|2026-08-17 10:00:00|1600/2/K/A|09.064|002577600|ALN|Fragment one+")
        p.parse(b"FLEX|2026-08-17 10:00:01|1600/2/K/A|09.064|002577600|ALN| and two")
        assert len(out) == 1
        assert out[0]["mode"] == "FLEX"
        assert out[0]["message"] == "Fragment one and two"


class TestOtherParsers:
    def test_selcall(self):
        out = []
        SelCallParser(out.append).parse(b"ZVEI1: 12345")
        assert out[0]["code"] == "12345"

    def test_ism(self):
        out = []
        IsmParser(out.append).parse({"model": "Acurite-606TX", "temperature_C": 21.5})
        assert out[0]["mode"] == "ISM"
        assert out[0]["model"] == "Acurite-606TX"

    def test_rds_accumulates_and_resets(self):
        out = []
        p = RdsParser(out.append)
        p.parse({"pi": "0xA123", "ps": "TESTFM"})
        p.parse({"radiotext": "Now playing"})
        assert out[-1]["ps"] == "TESTFM" and out[-1]["radiotext"] == "Now playing"
        p.parse({"pi": "0xB456"})
        assert "ps" not in out[-1]

    def test_eas(self):
        out = []
        EasParser(out.append).parse(
            b"EAS: ZCZC-WXR-RWT-012345+0030-2302119-KABC/NWS-")
        assert out[0]["mode"] == "EAS"
        assert out[0]["raw"].startswith("ZCZC-WXR-RWT")


class TestAircraft:
    def test_acars(self):
        cache = AircraftCache()
        p = AcarsParser(cache)
        p.parse({"tail": ".N12345", "flight": "UA123", "text": "hello", "label": "H1"})
        entry = cache.all()["N12345"]
        assert entry["flight"] == "UA123"

    def test_vdl2_with_position(self):
        cache = AircraftCache()
        p = Vdl2Parser(cache)
        p.parse({"vdl2": {"avlc": {
            "src": {"type": "Aircraft", "addr": "A1B2C3"},
            "xid": {"vdl_params": [
                {"name": "ac_location",
                 "value": {"loc": {"lat": 50.1, "lon": 8.6}}}]},
        }}})
        entry = cache.all()["A1B2C3"]
        assert entry["lat"] == 50.1

    def test_hfdl(self):
        cache = AircraftCache()
        HfdlParser(cache).parse({"hfdl": {"lpdu": {
            "ac_info": {"icao": "AABBCC"},
            "hfnpdu": {"flight_id": "BA42",
                       "pos": {"lat": 51.5, "lon": -0.1}}}}})
        entry = cache.all()["AABBCC"]
        assert entry["flight"] == "BA42" and entry["lat"] == 51.5

    def test_adsb_sbs(self):
        cache = AircraftCache()
        AdsbParser(cache).parse(
            b"MSG,3,1,1,4840D6,1,2026/08/17,10:00:00.000,2026/08/17,"
            b"10:00:00.000,KLM1023,37000,,,52.3,4.7,,,,,,")
        entry = cache.all()["4840D6"]
        assert entry["lat"] == 52.3 and entry["altitude"] == 37000

    def test_ttl_expiry(self):
        cache = AircraftCache(ttl=0.0)
        cache.update("X", {"mode": "ADSB"})
        import time
        time.sleep(0.01)
        assert cache.all() == {}

    def test_cpr_global_decode(self):
        # synthesize CPR pair from a known position using the encode rules
        lat, lon = 52.25720, 3.91937
        nz = 15
        def cpr(lat, lon, odd):
            dlat = 360 / (4 * nz - (1 if odd else 0))
            yz = (lat % dlat) / dlat
            nl = max(1, _nl_ref(lat) - (1 if odd else 0))
            dlon = 360 / nl
            xz = (lon % dlon) / dlon
            return yz, xz
        from openwebrx_tpu.services.aircraft import _nl as _nl_ref
        even = cpr(lat, lon, odd=False)
        odd = cpr(lat, lon, odd=True)
        out = cpr_decode_global(even, odd, last_odd=False)
        assert out is not None
        dlat, dlon = abs(out[0] - lat), abs(out[1] - lon)
        assert dlat < 0.01 and dlon < 0.01, out
