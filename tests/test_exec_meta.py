"""Exec-mode metadata feeders: DRM status socket, DAB labels+AFC, HDR
station info (VERDICT r2 task 6 — every panel's message type must be
drivable by a gated stub binary)."""

import json
import os
import socket
import stat
import threading
import time

import numpy as np
import pytest

from openwebrx_tpu.services.exec_meta import (
    DabAfc, DabMetaParser, DrmStatusMonitor, HdrMetaParser,
)


class TestDrmStatusMonitor:
    def test_socket_json_lines_forwarded(self, tmp_path):
        path = str(tmp_path / "dream.sock")
        server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        server.bind(path)
        server.listen(1)
        got = []
        mon = DrmStatusMonitor(path, got.append)
        mon.start()

        def serve():
            conn, _ = server.accept()
            conn.sendall(json.dumps(
                {"mode": "B", "snr": 18.4, "service": "Test Radio"}
            ).encode() + b"\n")
            conn.sendall(b'{"sync": true}\n')
            time.sleep(0.3)
            conn.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        deadline = time.time() + 5
        while len(got) < 2 and time.time() < deadline:
            time.sleep(0.05)
        mon.stop()
        server.close()
        assert len(got) >= 2
        first = got[0]
        # the DRM robustness mode is renamed; panel mode key is "DRM"
        assert first["mode"] == "DRM"
        assert first["drm_mode"] == "B"
        assert first["snr"] == 18.4
        assert got[1]["sync"] is True


class TestDabMeta:
    def test_dablin_stderr_lines(self):
        got = []
        p = DabMetaParser(got.append)
        p.feed_line(b'ENSEMBLE "DR Deutschland"')
        p.feed_line(b"Found audio service: SId 0xD210, 'Dlf'")
        p.feed_line(b"Found audio service: SId 0xD220, 'Dlf Kultur'")
        p.feed_line(b"Playing service 'Dlf'")
        assert got[0] == {"mode": "DAB", "ensemble_label": "DR Deutschland"}
        assert {"service_id": "D210", "label": "Dlf"} in got[1]["services"]
        assert len(got[2]["services"]) == 2
        assert got[3]["service_label"] == "Dlf"

    def test_json_passthrough_strips_afc_keys(self):
        got, shifts = [], []
        afc = DabAfc(shifts.append)
        p = DabMetaParser(got.append, afc)
        p.feed_line(json.dumps({"ensemble_id": 4321,
                                "coarse_frequency_shift": 1}).encode())
        p.feed_line(json.dumps({"fine_frequency_shift": 33}).encode())
        # AFC keys consumed (shift applied), payload keys forwarded
        assert got == [{"mode": "DAB", "ensemble_id": 4321}]
        assert shifts[0] == pytest.approx(-16.0)
        assert shifts[1] == pytest.approx(-16.0 - 11.0)

    def test_afc_clamps_at_carrier_spacing(self):
        shifts = []
        afc = DabAfc(shifts.append)
        for _ in range(200):
            afc.process({"coarse_frequency_shift": -1})
        assert max(shifts) <= 1000.0
        assert shifts[-1] == pytest.approx(1000.0)
        afc.reset()
        assert shifts[-1] == 0.0


class TestHdrMeta:
    def test_nrsc5_lines(self):
        got = []
        p = HdrMetaParser(got.append)
        p.feed_line(b"13:01:22 Synchronized")
        p.feed_line(b"13:01:23 Station name: KTPU-FM")
        p.feed_line(b"13:01:23 Slogan: All Tensor Hits")
        p.feed_line(b"13:01:30 Title: Systolic Dreams")
        p.feed_line(b"13:01:30 Artist: The Matmuls")
        p.feed_line(b"13:01:31 Audio bit rate: 96.0 kbps")
        last = got[-1]
        assert last["mode"] == "HDR"
        assert last["station"] == "KTPU-FM"
        assert last["slogan"] == "All Tensor Hits"
        assert last["title"] == "Systolic Dreams"
        assert last["artist"] == "The Matmuls"
        assert last["bitrate_kbps"] == 96.0
        assert last["sync"] is True


class TestExecHandleMetaIntegration:
    def test_pipeline_stderr_feeds_dab_parser(self, tmp_path):
        """SubprocessPipeline's stderr drain → DabMetaParser: the wiring
        ExecAudioHandle uses for dablin/nrsc5, driven by a stub binary."""
        from openwebrx_tpu.services.pipeline import SubprocessPipeline

        script = tmp_path / "fake_dablin"
        script.write_text(
            "#!/usr/bin/env python3\n"
            "import sys\n"
            "print('ENSEMBLE \"TPU Mux\"', file=sys.stderr, flush=True)\n"
            "print(\"Found audio service: SId 0xA001, 'Chip FM'\","
            " file=sys.stderr, flush=True)\n"
            "sys.stdin.buffer.read()\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        metas = []
        pipe = SubprocessPipeline(
            [str(script)], lambda b: None, line_based=False,
            on_stderr_line=DabMetaParser(metas.append).feed_line)
        deadline = time.time() + 10
        while len(metas) < 2 and time.time() < deadline:
            time.sleep(0.05)
        pipe.close()
        assert any(m.get("ensemble_label") == "TPU Mux" for m in metas)
        assert any(m.get("services") for m in metas)
        assert all(m["mode"] == "DAB" for m in metas)

    def test_stub_drm_socket_feeds_meta_panel(self, tmp_path):
        """End-to-end through ExecAudioHandle: a stub 'dream' plus a
        status-socket server drive {"mode": "DRM"} metadata to meta_cb."""
        from openwebrx_tpu.core.property import PropertyLayer
        from openwebrx_tpu.runtime.device import DeviceRuntime, ExecAudioHandle
        from openwebrx_tpu.sources.file import SignalSource

        script = tmp_path / "fake_dream"
        script.write_text(
            "#!/usr/bin/env python3\n"
            "import sys\n"
            "while True:\n"
            "    data = sys.stdin.buffer.read(4096)\n"
            "    if not data:\n"
            "        break\n"
            "    sys.stdout.buffer.write(b'\\x34\\x12' * 64)\n"
            "    sys.stdout.buffer.flush()\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)

        props = PropertyLayer(samp_rate=240000, center_freq=6000000,
                              throttle=False, noise=1e-3, signals=[])
        src = SignalSource("exec-meta", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.1)
        metas, audio = [], []
        handle = ExecAudioHandle(rt, "drm", 0.0,
                                 command_override=[str(script)])
        handle.meta_cb = metas.append
        handle.audio_cb = lambda data, hd: audio.append(data)
        # the monitor polls the socket path ExecAudioHandle allocated —
        # stand in for dream 2.2's --status-socket server
        server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        server.bind(handle._drm_socket_path)
        server.listen(1)

        def serve():
            conn, _ = server.accept()
            conn.sendall(b'{"mode": "B", "snr": 21.0, '
                         b'"service": "TPU DRM"}\n')
            time.sleep(0.5)
            conn.close()

        threading.Thread(target=serve, daemon=True).start()
        rt.start()
        try:
            deadline = time.time() + 15
            while (not metas or not audio) and time.time() < deadline:
                time.sleep(0.2)
        finally:
            handle.close()
            rt.stop()
            src.stop()
            server.close()
        assert audio
        assert metas and metas[0]["mode"] == "DRM"
        assert metas[0]["drm_mode"] == "B"
        assert metas[0]["service"] == "TPU DRM"
