"""Web agents: EIBI CSV parsing, receiver/repeater lists, cache behavior."""

import json
from datetime import datetime, timezone

import pytest

from openwebrx_tpu.web.agents import (
    EibiAgent, ReceiversAgent, RepeatersAgent, WebAgent,
)

EIBI_CSV = """\
4625;0000-2400;;RUS;The Buzzer;;Eu;;1;;
6070;0700-1600;1-5;D;Channel 292;E;Eu;;2;;
9420;0000-2400;;GRC;Voice of Greece;Greek;Eu;;3;;
8992;0000-2400;USB;USA;HF-GCS;;NAm;;4;;
14670;0000-2400;;CAN;CHU Ottawa;-CW;NAm;;5;;
"""


@pytest.fixture(autouse=True)
def data_dir(tmp_path, monkeypatch):
    from openwebrx_tpu.core.config import CoreConfig
    monkeypatch.setitem(CoreConfig.defaults, "data_directory", str(tmp_path))
    for cls in (EibiAgent, ReceiversAgent, RepeatersAgent):
        cls._instance = None
    return tmp_path


class TestEibi:
    def test_parse_csv(self):
        entries = EibiAgent.parse_csv(EIBI_CSV)
        assert len(entries) == 5
        buzzer = entries[0]
        assert buzzer["freq"] == 4625000
        assert buzzer["mode"] == "usb"          # < 4.8 MHz service default
        assert buzzer["days"] == "MTWTFSS"
        ch292 = entries[1]
        assert ch292["freq"] == 6070000
        assert ch292["mode"] == "am"
        assert ch292["days"] == "MTWTF.."       # 1-5 → weekdays
        assert entries[3]["mode"] == "usb"      # USB day-field
        assert entries[4]["mode"] == "cw"       # -CW language tag

    def test_current_entries_time_window(self, data_dir):
        agent = EibiAgent.shared()
        agent.data = EibiAgent.parse_csv(EIBI_CSV)
        # Wednesday 12:00 UTC: Channel 292 (0700-1600, Mo-Fr) is on air
        when = datetime(2026, 8, 19, 12, 0, tzinfo=timezone.utc)
        names = {e["name"] for e in agent.current_entries(when=when)}
        assert "Channel 292" in names
        # Sunday: weekday-only schedule is off
        sunday = datetime(2026, 8, 23, 12, 0, tzinfo=timezone.utc)
        names = {e["name"] for e in agent.current_entries(when=sunday)}
        assert "Channel 292" not in names
        assert "The Buzzer" in names            # 24 h schedule

    def test_current_bookmarks(self, data_dir):
        agent = EibiAgent.shared()
        agent.data = EibiAgent.parse_csv(EIBI_CSV)
        when = datetime(2026, 8, 19, 12, 0, tzinfo=timezone.utc)
        marks = agent.current_bookmarks((5_900_000, 9_500_000), when=when)
        freqs = [b["frequency"] for b in marks]
        assert 6070000 in freqs and 9420000 in freqs
        assert all("name" in b and "modulation" in b for b in marks)

    def test_marker_loader_uses_location_table(self, data_dir):
        (data_dir / "eibi-locations.json").write_text(json.dumps(
            {"RUS": [{"name": "Kerro", "lat": 60.3, "lon": 30.3}]}))
        agent = EibiAgent.shared()
        agent.data = EibiAgent.parse_csv(EIBI_CSV)
        markers = agent.marker_loader()
        assert "eibi-Kerro" in markers
        assert markers["eibi-Kerro"].to_json()["lat"] == 60.3


class TestReceivers:
    def test_parse_websdr(self):
        text = json.dumps([
            {"url": "http://websdr.example.org:8901", "lat": 52.2,
             "lon": 6.8, "desc": "Example WebSDR"},
            {"url": "http://nolocation.example.org"},
        ])
        out = ReceiversAgent.parse_websdr_list(text)
        assert len(out) == 1
        assert out[0]["id"] == "websdr.example.org:8901"
        assert out[0]["type"] == "websdr"

    def test_parse_kiwisdr(self):
        text = ("url=http://kiwi.example.com:8073 <br>\n"
                "name=Example Kiwi\n"
                "gps=(47.3, 8.5)\n"
                "<!-- gps -->\n"
                "url=http://nogps.example.com:8073\n")
        out = ReceiversAgent.parse_kiwisdr_list(text)
        assert len(out) == 1
        assert out[0]["lat"] == 47.3 and out[0]["type"] == "kiwisdr"

    def test_marker_loader(self, data_dir):
        agent = ReceiversAgent.shared()
        agent.data = [{"id": "x.example", "lat": 1.0, "lon": 2.0,
                       "url": "http://x.example", "type": "websdr",
                       "name": "X"}]
        markers = agent.marker_loader()
        assert markers["recv-x.example"].to_json()["mode"] == "Receivers"


class TestRepeaters:
    RB = json.dumps({"results": [
        {"Callsign": "DB0ABC", "Frequency": "439.100", "Lat": "48.1",
         "Long": "11.5", "DMR": "Yes", "Nearest City": "Munich"},
        {"Callsign": "DB0XYZ", "Frequency": "145.600", "Lat": "48.2",
         "Long": "11.6", "Nearest City": "Munich"},
        {"Callsign": "BROKEN"},
    ]})

    def test_parse_repeaterbook(self):
        out = RepeatersAgent.parse_repeaterbook(self.RB)
        assert len(out) == 2
        assert out[0]["mode"] == "dmr" and out[0]["freq"] == 439100000
        assert out[1]["mode"] == "nfm"

    def test_bookmarks_range(self, data_dir):
        agent = RepeatersAgent.shared()
        agent.data = RepeatersAgent.parse_repeaterbook(self.RB)
        marks = agent.current_bookmarks((144_000_000, 146_000_000))
        assert [b["name"] for b in marks] == ["DB0XYZ"]


class TestCacheLifecycle:
    def test_cache_roundtrip_and_backoff(self, data_dir):
        calls = []

        class Flaky(WebAgent):
            def empty(self):
                return []

            def _load_from_web(self):
                calls.append(1)
                if len(calls) < 3:
                    raise OSError("no route to host")
                return [{"ok": True}]

        agent = Flaky("flaky.json")
        assert agent.get_all() == []
        assert not agent.refresh() and agent.error_count == 1
        assert not agent.refresh() and agent.error_count == 2
        assert agent.refresh() and agent.error_count == 0
        assert agent.get_all() == [{"ok": True}]
        assert agent.has_fresh_data() and not agent.has_fresh_data()
        # a new instance loads from the cache file without network
        again = Flaky("flaky.json")
        assert again.get_all() == [{"ok": True}]


class TestBundledEibiLocations:
    def test_bundled_sample_loads_when_no_user_file(self, data_dir):
        # no eibi-locations.json in the data dir → bundled sample is used
        agent = EibiAgent()
        assert agent.locations, "bundled data/eibi-locations.json must load"
        assert "__doc__" not in agent.locations
        site = agent.locations["D-NAU"][0]
        assert site["name"] == "Nauen"
        assert 50 < site["lat"] < 55 and 10 < site["lon"] < 15

    def test_user_file_takes_precedence(self, data_dir):
        (data_dir / "eibi-locations.json").write_text(json.dumps(
            {"D-NAU": [{"name": "Override", "lat": 1.0, "lon": 2.0}]}))
        agent = EibiAgent()
        assert agent.locations["D-NAU"][0]["name"] == "Override"
