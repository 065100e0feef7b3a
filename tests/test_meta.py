"""Digital-voice metadata enrichment + DigitalVoiceHandle pipeline."""

import json
import time

import numpy as np
import pytest

from openwebrx_tpu.services.meta import (
    MetaParser, RadioIDCache, DmrEnricher,
)


@pytest.fixture(autouse=True)
def fresh_cache():
    RadioIDCache._instance = None
    saved = RadioIDCache.fetcher
    yield
    RadioIDCache.fetcher = saved
    RadioIDCache._instance = None


class TestMetaParser:
    def test_ysf_position_lands_on_map(self):
        from openwebrx_tpu.core.map import Map
        Map._instance = None
        metas = []
        p = MetaParser(metas.append)
        p.process({"protocol": "YSF", "source": "W1AW",
                   "lat": "41.7", "lon": "-72.7"})
        assert metas and metas[0]["lat"] == 41.7
        assert "W1AW" in Map.shared().positions

    def test_dmr_talker_alias_callsign(self):
        meta = {"protocol": "DMR", "talkeralias": "KN4CRD Jane"}
        assert DmrEnricher.callsign(meta) == "KN4CRD"

    def test_dmr_radioid_async_lookup(self):
        RadioIDCache.fetcher = staticmethod(
            lambda mode, rid: {"id": rid, "callsign": "TEST1"})
        metas = []
        p = MetaParser(metas.append)
        p.process({"protocol": "DMR", "source": "3100001"})
        deadline = time.time() + 3
        while len(metas) < 2 and time.time() < deadline:
            time.sleep(0.02)
        # immediate delivery + async re-delivery with the lookup result
        assert len(metas) == 2
        assert metas[1]["additional"]["callsign"] == "TEST1"
        # second lookup is a cache hit: single synchronous delivery
        metas.clear()
        p.process({"protocol": "DMR", "source": "3100001"})
        assert len(metas) == 1 and metas[0]["additional"]["callsign"] == "TEST1"

    def test_dstar_dprs_position(self):
        from openwebrx_tpu.core.map import Map
        Map._instance = None
        metas = []
        p = MetaParser(metas.append)
        p.process({"protocol": "DSTAR", "ourcall": "W1AW",
                   "dprs": "W1AW>API282,DSTAR*:!4142.00N/07242.00W>test"})
        assert metas and abs(metas[0]["lat"] - 41.7) < 0.01
        assert abs(metas[0]["lon"] + 72.7) < 0.01

    def test_feed_line_tolerates_junk(self):
        metas = []
        p = MetaParser(metas.append)
        p.feed_line(b"not json")
        p.feed_line(json.dumps({"protocol": "YSF", "source": "X1X"}).encode())
        assert len(metas) == 1


class TestDigitalVoiceHandle:
    def test_dibits_to_decoder_and_meta_back(self, tmp_path):
        """Fake decoder echoes dibit count as audio and writes one meta
        JSON line to the side fd — full DigitalVoiceHandle loop."""
        import stat

        from openwebrx_tpu.core.property import PropertyLayer
        from openwebrx_tpu.runtime.device import DeviceRuntime, DigitalVoiceHandle
        from openwebrx_tpu.sources.file import SignalSource

        script = tmp_path / "fake_dmr"
        script.write_text(
            "#!/usr/bin/env python3\n"
            "import json, os, sys\n"
            "meta_fd = int(sys.argv[1])\n"
            "data = sys.stdin.buffer.read(480)\n"
            "os.write(meta_fd, (json.dumps({'protocol': 'DMR',\n"
            "    'talkeralias': 'KN4CRD'}) + '\\n').encode())\n"
            "sys.stdout.buffer.write(b'\\x01\\x02' * len(data))\n"
            "sys.stdout.flush()\n"
            "sys.stdin.buffer.read()\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)

        props = PropertyLayer(samp_rate=240000, center_freq=439000000,
                              throttle=False, noise=1e-3, signals=[])
        src = SignalSource("dv-test", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.1)
        audio, metas = [], []
        handle = DigitalVoiceHandle(
            rt, "dmr", 0.0,
            command_override=[str(script), "{meta_fd}"])
        handle.audio_cb = lambda data, hd: audio.append(data)
        handle.meta_cb = metas.append
        rt.start()
        try:
            deadline = time.time() + 15
            while (not audio or not metas) and time.time() < deadline:
                time.sleep(0.1)
        finally:
            handle.close()
            rt.stop()
            src.stop()
        assert audio, "no audio back from decoder"
        assert metas and metas[0]["talkeralias"] == "KN4CRD"
