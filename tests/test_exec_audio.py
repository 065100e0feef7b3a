"""ExecAudioHandle: IQ → fake external decoder → audio back to listener."""

import stat
import time

import numpy as np
import pytest

from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.runtime.device import DeviceRuntime, ExecAudioHandle
from openwebrx_tpu.sources.file import SignalSource


class TestExecAudio:
    def test_fake_decoder_roundtrip(self, tmp_path):
        # fake 'dream': consumes cs16 IQ, emits a recognizable s16 pattern
        script = tmp_path / "fake_dream"
        script.write_text(
            "#!/usr/bin/env python3\n"
            "import sys\n"
            "while True:\n"
            "    data = sys.stdin.buffer.read(4096)\n"
            "    if not data:\n"
            "        break\n"
            "    sys.stdout.buffer.write(b'\\x34\\x12' * 256)\n"
            "    sys.stdout.buffer.flush()\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)

        props = PropertyLayer(samp_rate=240000, center_freq=100000000,
                              throttle=False, noise=1e-3, signals=[])
        src = SignalSource("exec-audio", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.1)
        audio = []
        handle = ExecAudioHandle(rt, "drm", 10000.0,
                                 command_override=[str(script)])
        handle.audio_cb = lambda data, hd: audio.append(data)
        rt.start()
        try:
            deadline = time.time() + 15
            while not audio and time.time() < deadline:
                time.sleep(0.2)
        finally:
            handle.close()
            rt.stop()
            src.stop()
        assert audio, "no audio from exec decoder"
        samples = np.frombuffer(audio[0], np.int16)
        assert samples[0] == 0x1234


class TestM17MetaTap:
    def test_native_metadata_beside_external_decoder(self, tmp_path):
        """Round 5: an M17 listener's ExecAudioHandle feeds the SAME cs16
        IF stream to the external decoder AND the native link layer — the
        MetaPanel gets callsigns even with the binary stubbed."""
        import stat as _stat
        from openwebrx_tpu.digimodes import m17
        from openwebrx_tpu.runtime.device import M17MetaTap

        sink = tmp_path / "sink"
        sink.write_text("#!/bin/sh\ncat > /dev/null\n")
        sink.chmod(sink.stat().st_mode | _stat.S_IEXEC)

        props = PropertyLayer(samp_rate=240000, center_freq=145000000,
                              throttle=False, noise=1e-3, signals=[])
        src = SignalSource("m17-exec", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.1)
        handle = ExecAudioHandle(rt, "m17", 0.0,
                                 command_override=[str(sink)])
        metas = []
        handle.meta_cb = metas.append
        try:
            # inject wire bytes straight at the tap feed point (the IQ
            # channel callback), proving the _feed_both wiring
            assert handle._m17_tap is not None
            frame = m17.build_lsf_frame("N0CALL", "SP5WWP")
            import sys
            sys.path.insert(0, "tests")
            from test_digital_voice import c4fm_waveform
            rng = np.random.default_rng(5)
            idle = rng.integers(0, 4, 150).astype(np.uint8)
            x = c4fm_waveform(
                np.concatenate([idle, frame, frame, frame, idle]),
                baud=4800.0, dev_hz=800.0, fs=M17MetaTap.IF_RATE,
                rrc_alpha=0.5)
            inter = np.empty(2 * len(x), np.int16)
            inter[0::2] = np.clip(x.real * 32767, -32768, 32767)
            inter[1::2] = np.clip(x.imag * 32767, -32768, 32767)
            handle.iq.iq_cb(inter.tobytes())
            deadline = time.time() + 10
            while not metas and time.time() < deadline:
                time.sleep(0.1)
        finally:
            handle.close()
            src.stop()
        lsfs = [m for m in metas if m.get("source")]
        assert lsfs and lsfs[0]["source"] == "SP5WWP"
        assert lsfs[0]["protocol"] == "M17"
