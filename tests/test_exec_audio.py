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
