"""Exec-mode services with fake decoder binaries."""

import stat
import sys
import time

import numpy as np

from openwebrx_tpu.aprs.kiss import kiss_escape
from openwebrx_tpu.services.exec_modes import ExecModeService


def make_script(tmp_path, name, body):
    script = tmp_path / name
    script.write_text(body)
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


class TestExecModes:
    def test_page_pipeline(self, tmp_path):
        # fake multimon-ng: prints one POCSAG line after consuming stdin
        fake = make_script(tmp_path, "fake_multimon", (
            "#!/bin/sh\n"
            "head -c 100 > /dev/null\n"
            "echo 'POCSAG1200: Address: 4242  Function: 0  Alpha:   Paged!'\n"
            "cat > /dev/null\n"))
        events = []
        svc = ExecModeService("page", events.append,
                              command_override=[fake])
        svc.feed(b"\x00" * 200)
        deadline = time.time() + 5
        while not events and time.time() < deadline:
            time.sleep(0.05)
        svc.close()
        assert events and events[0]["address"] == 4242
        assert events[0]["message"] == "Paged!"

    def test_packet_kiss_stdout(self, tmp_path):
        # fake direwolf: emits one KISS-framed AX.25 APRS packet on stdout
        from tests.test_aprs import build_ui_frame
        frame = build_ui_frame(("N0CALL", 9), "APRS", [],
                               b"!4903.50N/07201.75W-via fake direwolf")
        kiss_hex = kiss_escape(frame).hex()
        fake = make_script(tmp_path, "fake_direwolf", (
            "#!/usr/bin/env python3\n"
            "import sys, binascii\n"
            "sys.stdin.buffer.read(64)\n"
            f"sys.stdout.buffer.write(binascii.unhexlify('{kiss_hex}'))\n"
            "sys.stdout.buffer.flush()\n"
            "sys.stdin.buffer.read()\n"))
        from openwebrx_tpu.core.map import Map
        Map._instance = None
        events = []
        svc = ExecModeService("packet", events.append,
                              command_override=[fake])
        svc.feed(b"\x00" * 128)
        deadline = time.time() + 5
        while not events and time.time() < deadline:
            time.sleep(0.05)
        svc.close()
        assert events, "no packet events"
        ev = events[0]
        assert ev["source"] == "N0CALL-9"
        assert abs(ev["lat"] - 49.0583) < 0.001
        # the position reached the map
        assert any(p["callsign"] == "N0CALL-9" for p in Map.shared().full_dump())


class TestSatellite:
    def test_satdump_command_and_modes(self, tmp_path, monkeypatch):
        from openwebrx_tpu.core.config import CoreConfig
        from openwebrx_tpu.services.exec_modes import IQ_EXEC_MODES
        monkeypatch.setitem(CoreConfig.defaults, "temporary_directory",
                            str(tmp_path))
        assert {"noaa-apt-15", "noaa-apt-18", "noaa-apt-19",
                "meteor-lrpt"} <= set(IQ_EXEC_MODES)
        spec = IQ_EXEC_MODES["noaa-apt-19"]
        cmd = spec["command"](spec["if_rate"], 137100000)
        assert cmd[:3] == ["satdump", "live", "noaa_apt"]
        assert "--satellite_number" in cmd and "19" in cmd
        assert "--samplerate" in cmd and "50000" in cmd
        assert spec["wire"] == "cf32"
        # output folder was created under the temp dir
        out = cmd[3]
        import os
        assert out.startswith(str(tmp_path)) and os.path.isdir(out)

    def test_satdump_parser_events(self):
        from openwebrx_tpu.services.exec_modes import make_iq_parser
        events = []
        parse = make_iq_parser("satdump", events.append)
        parse(b"[INFO] Decoding...")
        parse(b"[INFO] Saving image channel_1.png")
        assert len(events) == 1
        assert events[0]["mode"] == "WXSAT"
        assert "channel_1.png" in events[0]["message"]
