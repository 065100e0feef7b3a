"""DirectSource: stdout-IQ driver subprocess, restart-on-retune semantics."""

import sys
import time

import numpy as np

from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.sources.direct import DirectSource

# fake driver: writes deterministic s16 interleaved IQ forever; prints the
# center_freq argument into the samples so retunes are observable
FAKE_DRIVER = (
    "import sys, struct, time\n"
    "freq = int(float(sys.argv[1])) % 32000\n"
    "frame = struct.pack('<2h', freq, -freq) * 4096\n"
    "while True:\n"
    "    sys.stdout.buffer.write(frame)\n"
    "    sys.stdout.buffer.flush()\n"
    "    time.sleep(0.005)\n"
)


def make_source(freq=145000000):
    props = PropertyLayer(
        type="direct",
        command=(f"{sys.executable} -c \"{FAKE_DRIVER}\" {{center_freq}}"),
        center_freq=freq, samp_rate=48000, iq_format="s16",
        enabled=True, always_on=False,
    )
    src = DirectSource("test-direct", props)
    src.block_size = 8192
    return src


class TestDirectSource:
    def test_stream_and_restart_on_retune(self):
        src = make_source(freq=145001000)
        src.start()
        try:
            block = src.read_block(timeout=10.0)
            assert block is not None and block.dtype == np.complex64
            assert len(block) == 8192
            expect = (145001000 % 32000) / 32768.0
            assert abs(float(block.real[0]) - expect) < 1e-4
            # retune → subprocess restarted with the new frequency
            src.set_center_freq(145020000)
            expect2 = (145020000 % 32000) / 32768.0
            deadline = time.time() + 10
            seen = False
            while time.time() < deadline:
                b = src.read_block(timeout=2.0)
                if b is not None and abs(float(b.real[0]) - expect2) < 1e-4:
                    seen = True
                    break
            assert seen, "retuned driver output never arrived"
        finally:
            src.shutdown()

    def test_stop_terminates_driver(self):
        src = make_source()
        src.start()
        assert src.read_block(timeout=10.0) is not None
        proc = src._process
        src.shutdown()
        assert proc is None or proc.poll() is not None
