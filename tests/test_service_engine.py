"""Background services end-to-end: bandplan dial → service channel →
chopper → fake decoder → spot lands on the map + reporting."""

import stat
import time

import numpy as np
import pytest

from openwebrx_tpu.core.bands import Band, Bandplan
from openwebrx_tpu.core.config import Config, CoreConfig
from openwebrx_tpu.core.map import Map
from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.reporting import ReportingEngine, Reporter
from openwebrx_tpu.runtime.device import DeviceRuntime
from openwebrx_tpu.services import engine as svc_engine
from openwebrx_tpu.services.queue import DecoderQueue
from openwebrx_tpu.services.wsjt import Ft8Profile, PROFILES
from openwebrx_tpu.sources.file import SignalSource


@pytest.fixture()
def fake_env(tmp_path, monkeypatch):
    Config.reset()
    DecoderQueue.reset()
    ReportingEngine.reset()
    Map._instance = None
    config = Config.get()
    config["services_enabled"] = True
    config["services_decoders"] = ["ft8"]
    monkeypatch.setitem(CoreConfig.defaults, "temporary_directory", str(tmp_path))

    script = tmp_path / "fake_jt9"
    script.write_text("#!/bin/sh\n"
                      "echo '222100 -15 -0.0  508 ~  CQ EA7MJ IM66'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)

    class FastFt8(Ft8Profile):
        interval = 1

        def decoder_commandline(self, file):
            return [str(script), file]

    monkeypatch.setitem(PROFILES, "ft8", FastFt8)
    # bandplan with one FT8 dial inside the test passband
    monkeypatch.setattr(Bandplan, "_instance", Bandplan(
        [Band("test", 14000000, 14350000, ["hamradio"], {"ft8": 14074000})]))
    yield tmp_path
    svc_engine.Services.stop()
    DecoderQueue.reset()
    ReportingEngine.reset()
    Config.reset()


class TestServiceEngine:
    def test_ft8_service_spots(self, fake_env):
        props = PropertyLayer(
            samp_rate=240000, center_freq=14100000, throttle=False, noise=1e-4,
            signals=[{"kind": "usb", "offset_hz": -26000.0, "f_audio": 1000.0,
                      "amplitude": 0.4}])
        src = SignalSource("svc-test", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.1)
        spots = []

        class CaptureReporter(Reporter):
            def spot(self, spot):
                spots.append(spot)

        ReportingEngine.shared().add(CaptureReporter())
        handler = svc_engine.ServiceHandler(rt)
        rt.start()
        try:
            deadline = time.time() + 20
            while not spots and time.time() < deadline:
                time.sleep(0.25)
        finally:
            handler.shutdown()
            rt.stop()
            src.stop()
        assert handler.services == []  # stopped cleanly
        assert spots, "no spots reported"
        assert spots[0]["callsign"] == "EA7MJ"
        # the spot also landed on the map
        dump = Map.shared().full_dump()
        assert any(p["callsign"] == "EA7MJ" for p in dump)


@pytest.fixture()
def iq_env(tmp_path, monkeypatch):
    Config.reset()
    DecoderQueue.reset()
    ReportingEngine.reset()
    Map._instance = None
    config = Config.get()
    config["services_enabled"] = True
    config["services_decoders"] = ["ism"]

    script = tmp_path / "fake_rtl433"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "sys.stdin.buffer.read(4096)\n"
        "print('{\"model\": \"Fake-Sensor\", \"temperature_C\": 21.5}', flush=True)\n"
        "sys.stdin.buffer.read()\n")
    import stat as stat_mod
    script.chmod(script.stat().st_mode | stat_mod.S_IEXEC)

    from openwebrx_tpu.services import exec_modes
    monkeypatch.setitem(exec_modes.IQ_EXEC_MODES, "ism", {
        "if_rate": 24000, "wire": "cs16", "requirement": "ism",
        "command": lambda rate, dial: [str(script)],
        "parser": "ism",
    })
    monkeypatch.setattr(Bandplan, "_instance", Bandplan(
        [Band("ism-test", 433000000, 434000000, [], {"ism": 433920000})]))
    yield
    svc_engine.Services.stop()
    DecoderQueue.reset()
    ReportingEngine.reset()
    Config.reset()


class TestIqExecService:
    def test_ism_service_events(self, iq_env):
        from openwebrx_tpu.core.metrics import Metrics
        props = PropertyLayer(
            samp_rate=240000, center_freq=433900000, throttle=False, noise=1e-3,
            signals=[])
        src = SignalSource("ism-test", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.1)
        handler = svc_engine.ServiceHandler(rt)
        rt.start()
        try:
            deadline = time.time() + 20
            metric = None
            while time.time() < deadline:
                metric = Metrics.shared().get("services.events.ISM")
                if metric is not None and metric.get_value()["count"] > 0:
                    break
                time.sleep(0.25)
            assert metric is not None and metric.get_value()["count"] > 0, \
                "no ISM events counted"
        finally:
            handler.shutdown()
            rt.stop()
            src.stop()
