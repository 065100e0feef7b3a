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
