"""GPS updater, rig control, callsign/MMSI lookup tests."""

import json
import socket
import threading
import time

from openwebrx_tpu.core.lookup import HamCallsign, MmsiNumber


class TestLookup:
    def test_callsign_longest_prefix(self):
        assert HamCallsign.get_country("DL1ABC") == ("de", "Germany")
        assert HamCallsign.get_country("HB9XYZ") == ("ch", "Switzerland")
        assert HamCallsign.get_country("HB0A") == ("li", "Liechtenstein")
        # digit-ranged ITU series (second char a digit): L2A-L9Z etc.
        assert HamCallsign.get_country("L9XYZ") == ("ar", "Argentina")
        assert HamCallsign.get_country("Y5ABC") == ("de", "Germany")
        assert HamCallsign.get_country("P9AA")[1] == "North Korea"
        assert HamCallsign.get_country("D9AA")[1] == "South Korea"
        assert HamCallsign.get_country("C9AA")[1] == "Mozambique"
        assert HamCallsign.get_country("W1AW") == ("us", "United States")
        assert HamCallsign.get_country("EA7MJ/P")[1] == "Spain"
        # ZZ… is inside the ZVA–ZZZ Brazil series (full ITU table now)
        assert HamCallsign.get_country("ZZ2ABC")[1] == "Brazil"
        assert HamCallsign.get_country("0XYZ") is None   # 0 not allocated
        assert HamCallsign.get_country("VP8ABC")[1] == "Falkland Islands"
        assert HamCallsign.get_country("3DA0RS")[1] == "Eswatini"
        assert HamCallsign.get_country("3D2AB")[1] == "Fiji"
        assert HamCallsign.get_country("SSN1AB")[1] == "Sudan"
        assert HamCallsign.get_country("SU1AB")[1] == "Egypt"

    def test_mmsi(self):
        out = MmsiNumber.parse("211234567")
        assert out["type"] == "ship" and out["country"] == "Germany"
        assert MmsiNumber.parse("002320001")["type"] == "coast station"
        assert MmsiNumber.parse("111232001")["type"] == "SAR aircraft"
        assert MmsiNumber.parse("abc")["type"] == "invalid"
        # 970xxxxxx: digits 4-6 are a manufacturer ID, never a country MID
        sart = MmsiNumber.parse("970211234")
        assert sart["type"] == "AIS SART" and sart.get("country") is None


class TestGps:
    def test_tpv_updates_config(self):
        from openwebrx_tpu.core.config import Config
        from openwebrx_tpu.core.gps import GpsUpdater

        Config.reset()
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def serve():
            conn, _ = srv.accept()
            conn.recv(256)  # WATCH command
            conn.sendall((json.dumps({"class": "VERSION"}) + "\n").encode())
            conn.sendall((json.dumps({"class": "TPV", "lat": 48.1,
                                      "lon": 11.5}) + "\n").encode())
            time.sleep(0.5)
            conn.close()
            srv.close()

        threading.Thread(target=serve, daemon=True).start()
        updater = GpsUpdater("127.0.0.1", port)
        updater.start()
        deadline = time.time() + 5
        while time.time() < deadline:
            gps = Config.get().get("receiver_gps", {})
            if gps and gps.get("lat") == 48.1:
                break
            time.sleep(0.05)
        updater.stop()
        assert Config.get()["receiver_gps"]["lat"] == 48.1
        Config.reset()


class TestConfigMigration:
    def test_v1_to_v8_chain(self):
        from openwebrx_tpu.core.migration import migrate
        cfg = {
            "version": 1,
            "receiver_gps": [48.1, 11.5],
            "waterfall_auto_level_margin": [3, 10],
            "wsjt_queue_workers": 3,
            "waterfall_min_level": -88,
            "waterfall_max_level": -20,
            "frequency_display_precision": 4,
            "callsign_url": "https://www.qrz.com/db/{}",
            "sdrs": {"dev": {"waterfall_min_level": -80,
                             "waterfall_max_level": -30,
                             "profiles": {"p": {"waterfall_min_level": -70,
                                                "waterfall_max_level": -10}}}},
        }
        out = migrate(cfg)
        assert out["version"] == 8
        assert out["receiver_gps"] == {"lat": 48.1, "lon": 11.5}
        assert out["decoding_queue_workers"] == 3
        assert out["waterfall_levels"] == {"min": -88, "max": -20}
        assert out["sdrs"]["dev"]["waterfall_levels"] == {"min": -80, "max": -30}
        assert out["sdrs"]["dev"]["profiles"]["p"]["waterfall_levels"] == \
            {"min": -70, "max": -10}
        assert out["tuning_precision"] == 2
        assert out["callsign_service"] == "qrz"
        assert out["waterfall_auto_levels"] == {"min": 3, "max": 10}
        assert "waterfall_auto_level_margin" not in out

    def test_newer_version_rejected(self):
        import pytest
        from openwebrx_tpu.core.migration import migrate
        with pytest.raises(ValueError):
            migrate({"version": 99})

    def test_dynamic_config_migrates_on_load(self, tmp_path):
        import json
        from openwebrx_tpu.core.config import DynamicConfig
        path = tmp_path / "settings.json"
        path.write_text(json.dumps({"version": 1,
                                    "receiver_gps": [1.0, 2.0]}))
        dyn = DynamicConfig(str(path))
        assert dyn["receiver_gps"] == {"lat": 1.0, "lon": 2.0}
        assert dyn["version"] == 8
