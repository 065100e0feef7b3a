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
        assert HamCallsign.get_country("W1AW") == ("us", "United States")
        assert HamCallsign.get_country("EA7MJ/P")[1] == "Spain"
        assert HamCallsign.get_country("ZZZ9ZZ") is None

    def test_mmsi(self):
        out = MmsiNumber.parse("211234567")
        assert out["type"] == "ship" and out["country"] == "Germany"
        assert MmsiNumber.parse("002320001")["type"] == "coast station"
        assert MmsiNumber.parse("111232001")["type"] == "SAR aircraft"
        assert MmsiNumber.parse("abc")["type"] == "invalid"


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
