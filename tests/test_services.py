"""Service decode pipeline: chopper → queue → decoder subprocess → parser."""

import os
import stat
import time

import numpy as np
import pytest

from openwebrx_tpu.services.wsjt import (
    Ft8Profile, WsprProfile, WsjtParser, parse_qso_message, parse_beacon_message,
)


class TestWsjtParser:
    def test_ft8_line(self):
        p = WsjtParser()
        out = p.parse(Ft8Profile(), 14074000,
                      b"222100 -15 -0.0  508 ~  CQ EA7MJ IM66")
        assert out["db"] == -15.0
        assert out["dt"] == -0.0
        assert out["freq"] == 14074508
        assert out["msg"] == "CQ EA7MJ IM66"
        assert out["callsign"] == "EA7MJ"
        assert out["locator"] == "IM66"
        assert out["mode"] == "FT8"

    def test_wspr_line(self):
        p = WsjtParser()
        out = p.parse(WsprProfile(), 14095600,
                      b"2600 -24  0.4   0.001492 -1  G8AXA JO01 33")
        assert out["db"] == -24.0
        assert out["freq"] == 14095600 + 1492
        assert out["drift"] == -1
        assert out["callsign"] == "G8AXA"
        assert out["locator"] == "JO01"
        assert out["dbm"] == "33"

    def test_skips_debug_lines(self):
        p = WsjtParser()
        assert p.parse(Ft8Profile(), 0, b"<DecodeFinished>  0  23") is None
        assert p.parse(Ft8Profile(), 0, b" EOF on input file foo.wav") is None

    def test_signoff_extracts_callee(self):
        out = parse_qso_message("EA7MJ K1ABC 73")
        assert out == {"callsign": "K1ABC", "callee": "EA7MJ"}

    def test_beacon(self):
        assert parse_beacon_message("G8AXA JO01 33") == {
            "callsign": "G8AXA", "locator": "JO01", "dbm": "33"}


@pytest.fixture()
def fake_decoder(tmp_path):
    """A decoder 'binary' printing one canned FT8 decode line."""
    script = tmp_path / "fake_jt9"
    script.write_text(
        "#!/bin/sh\n"
        "echo '222100 -15 -0.0  508 ~  CQ EA7MJ IM66'\n"
        "echo '<DecodeFinished>  0  1'\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


class TestChopperPipeline:
    def test_end_to_end(self, tmp_path, fake_decoder):
        from openwebrx_tpu.services.chopper import AudioChopper
        from openwebrx_tpu.services.queue import DecoderQueue

        class FastProfile(Ft8Profile):
            interval = 1

            def decoder_commandline(self, file):
                return [fake_decoder, file]

        DecoderQueue.reset()
        spots = []
        chopper = AudioChopper(FastProfile(), 14074000, str(tmp_path),
                               spots.append, skew=0.0)
        audio = (np.sin(np.arange(2400) * 0.3) * 8000).astype(np.int16)
        deadline = time.time() + 10
        while not spots and time.time() < deadline:
            chopper.write(audio.tobytes())
            time.sleep(0.1)
        chopper.close()
        DecoderQueue.reset()
        assert spots, "no spots decoded"
        assert spots[0]["callsign"] == "EA7MJ"
        assert spots[0]["freq"] == 14074508
        # wav files are cleaned up after decode
        time.sleep(0.3)
        leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".wav")]
        assert leftovers == [], f"undeleted wav files: {leftovers}"


class TestJs8Parser:
    def test_heartbeat_with_grid_yields_spot(self):
        from openwebrx_tpu.services.js8 import Js8NormalProfile, Js8Parser
        p = Js8Parser()
        out = p.parse(Js8NormalProfile(), 7078000,
                      b"231530 -11  0.5 1250 A  KN4CRD: @HB HEARTBEAT EM73")
        assert out["mode"] == "JS8"
        assert out["callsign"] == "KN4CRD"
        assert out["locator"] == "EM73"
        assert out["thread_type"] == "heartbeat"
        assert out["freq"] == 7078000 + 1250
        assert out["db"] == -11.0
        assert out["js8mode"] == "A"

    def test_directed_message(self):
        from openwebrx_tpu.services.js8 import Js8NormalProfile, Js8Parser
        p = Js8Parser()
        out = p.parse(Js8NormalProfile(), 7078000,
                      b"231545  -3  0.2  750 A  OH8STN: KN4CRD SNR -12")
        assert out["thread_type"] == "directed"
        assert out["callsign"] == "OH8STN"
        assert out["callee"] == "KN4CRD"
        assert "locator" not in out

    def test_decoder_noise_skipped(self):
        from openwebrx_tpu.services.js8 import Js8NormalProfile, Js8Parser
        p = Js8Parser()
        assert p.parse(Js8NormalProfile(), 0, b"<DecodeFinished>") is None
        assert p.parse(Js8NormalProfile(), 0, b"") is None

    def test_profiles_and_commandline(self):
        from openwebrx_tpu.services.js8 import JS8_PROFILES, Js8TurboProfile
        assert set(JS8_PROFILES) >= {"js8", "js8slow", "js8fast", "js8turbo"}
        cmd = Js8TurboProfile().decoder_commandline("/tmp/x.wav")
        assert cmd[:4] == ["js8", "--js8", "-b", "C"]
        assert Js8TurboProfile().interval == 6

    def test_engine_profiles_include_js8(self):
        from openwebrx_tpu.services.engine import CHOPPER_MODES
        assert "js8" in CHOPPER_MODES and "ft8" in CHOPPER_MODES


class TestEnabledProfiles:
    def test_multi_interval_js8(self):
        from openwebrx_tpu.core.config import Config
        from openwebrx_tpu.core.property import PropertyLayer
        from openwebrx_tpu.services.wsjt import enabled_profiles
        layer = PropertyLayer(js8_enabled_profiles=["normal", "slow", "fast"])
        Config.get().add_layer(0, layer)
        try:
            profiles = enabled_profiles("js8")
            assert sorted(p.interval for p in profiles) == [10, 15, 30]
        finally:
            Config.get().remove_layer(layer)

    def test_fst4_intervals_filtered(self):
        from openwebrx_tpu.core.config import Config
        from openwebrx_tpu.core.property import PropertyLayer
        from openwebrx_tpu.services.wsjt import enabled_profiles
        layer = PropertyLayer(fst4_enabled_intervals=[15, 60, 7])  # 7 invalid
        Config.get().add_layer(0, layer)
        try:
            profiles = enabled_profiles("fst4")
            assert sorted(p.interval for p in profiles) == [15, 60]
        finally:
            Config.get().remove_layer(layer)

    def test_single_profile_modes(self):
        from openwebrx_tpu.services.wsjt import Ft8Profile, enabled_profiles
        profiles = enabled_profiles("ft8")
        assert len(profiles) == 1 and isinstance(profiles[0], Ft8Profile)


class TestMultiProfileChopper:
    def test_shared_recording_decoded_per_profile(self, tmp_path):
        import stat
        import time as time_mod

        from openwebrx_tpu.services.chopper import AudioChopper
        from openwebrx_tpu.services.queue import DecoderQueue
        from openwebrx_tpu.services.wsjt import Ft8Profile

        DecoderQueue.reset()
        script = tmp_path / "fake_decoder"
        script.write_text("#!/bin/sh\n"
                          "echo \"222100 -15 -0.0  508 ~  CQ EA7MJ IM66\"\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)

        class P1(Ft8Profile):
            interval = 1

            def decoder_commandline(self, file):
                return [str(script), file]

        class P2(P1):
            pass

        spots = []
        chopper = AudioChopper([P1(), P2()], 14074000, str(tmp_path),
                               spots.append, skew=0.0)
        import numpy as np
        data = np.zeros(1200, np.int16).tobytes()
        deadline = time_mod.time() + 10
        while len(spots) < 2 and time_mod.time() < deadline:
            chopper.write(data)
            time_mod.sleep(0.05)
        chopper.close()
        DecoderQueue.reset()
        assert len(spots) >= 2  # both profiles decoded the shared file
        # shared recording removed after the LAST decode
        leftovers = [f for f in tmp_path.iterdir()
                     if f.name.startswith("openwebrx-chopper")]
        assert leftovers == []
