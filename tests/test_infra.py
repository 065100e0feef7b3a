"""Map / bandplan / bookmarks / reporting / metrics unit tests."""

import numpy as np
import pytest

from openwebrx_tpu.core.bands import Bandplan
from openwebrx_tpu.core.bookmarks import Bookmark, Bookmarks
from openwebrx_tpu.core.map import Map, LocatorLocation, LatLngLocation
from openwebrx_tpu.core.metrics import Metrics, CounterMetric, DirectMetric


class TestMap:
    def test_locator_to_latlon(self):
        loc = LocatorLocation("JO62QM")  # Berlin-ish
        assert 52 < loc.lat < 53
        assert 13 < loc.lon < 14
        loc4 = LocatorLocation("IM66")  # southern Spain
        assert -10 < loc4.lon < -5 and 36 < loc4.lat < 37

    def test_store_and_expiry(self):
        m = Map()
        m.update_location("TE5T", LatLngLocation(50.0, 10.0), "FT8", "20m")
        dump = m.full_dump()
        assert dump[0]["callsign"] == "TE5T"
        m.positions["TE5T"]["lastseen"] = 0
        assert m.full_dump() == []

    def test_broadcast(self):
        m = Map()
        seen = []
        m.subscribe(seen.append)
        m.update_location("AB1CD", LatLngLocation(1, 2), "APRS")
        assert seen and seen[0][0]["callsign"] == "AB1CD"


class TestBandplan:
    def test_find_band(self):
        bp = Bandplan.shared()
        assert bp.find_band(14074000).get_name() == "20m"
        assert bp.find_band(101000000).get_name() == "FM bc"
        assert bp.find_band(99999999999) is None

    def test_dial_frequencies_in_range(self):
        bp = Bandplan.shared()
        dials = bp.collect_dial_frequencies(14000000, 14350000)
        modes = {d["mode"] for d in dials}
        assert "ft8" in modes and "wspr" in modes
        assert all(14000000 <= d["frequency"] <= 14350000 for d in dials)


class TestBookmarks:
    def test_store_roundtrip(self, tmp_path):
        path = str(tmp_path / "bookmarks.json")
        store = Bookmarks(path)
        store.add(Bookmark({"name": "Calling", "frequency": 145500000,
                            "modulation": "nfm"}))
        reloaded = Bookmarks(path)
        got = reloaded.get_bookmarks()
        assert got[0].name == "Calling"
        assert got[0].scannable is True

    def test_range_subscription(self, tmp_path):
        store = Bookmarks(str(tmp_path / "b.json"))
        fired = []
        store.subscribe((144e6, 146e6), lambda: fired.append(1))
        store.add(Bookmark({"name": "in", "frequency": 145e6}))
        store.add(Bookmark({"name": "out", "frequency": 7.1e6}))
        assert len(fired) == 1


class TestReporting:
    def test_pskreporter_encode(self):
        from openwebrx_tpu.reporting.pskreporter import PskReporter
        r = PskReporter("N0CALL", locator="JO62")
        r.stop()
        spot = {"callsign": "EA7MJ", "locator": "IM66", "freq": 14074508,
                "db": -15.0, "mode": "FT8", "timestamp": 1700000000000}
        payload = r.encode([spot])
        assert payload[:2] == b"\x00\x0a"            # IPFIX version
        assert len(payload) % 4 == 0
        assert b"EA7MJ" in payload and b"N0CALL" in payload
        assert r.supports_mode("FT8") and not r.supports_mode("nfm")

    def test_pskreporter_dedupe(self):
        from openwebrx_tpu.reporting.pskreporter import PskReporter
        r = PskReporter("N0CALL")
        r.stop()
        spot = {"callsign": "EA7MJ", "locator": "IM66", "freq": 14074508}
        r.spot(spot)
        r.spot(dict(spot))
        assert len(r._spots) == 1

    def test_wsprnet_encode(self):
        from openwebrx_tpu.reporting.wsprnet import WsprnetReporter
        r = WsprnetReporter("N0CALL", "JO62")
        r.stop()
        q = r.encode({"callsign": "G8AXA", "locator": "JO01", "dbm": "33",
                      "freq": 14097092, "db": -24, "dt": 0.4,
                      "timestamp": 1700000000000})
        assert "tcall=G8AXA" in q and "function=wspr" in q


class TestMetrics:
    def test_hierarchy_and_prometheus(self):
        m = Metrics()
        m.counter("decoding.queue.in").inc(3)
        m.add("cpu.usage", DirectMetric(0.5))
        h = m.get_hierarchical()
        assert h["decoding"]["queue"]["in"]["count"] == 3
        prom = m.render_prometheus()
        assert "decoding_queue_in_total 3" in prom
        assert "cpu_usage 0.5" in prom
