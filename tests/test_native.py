"""Native IQ ingest: build, data integrity over TCP, formats, overrun."""

import os
import socket
import threading
import time

import numpy as np
import pytest

from openwebrx_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable")


def serve_bytes(payload: bytes, chunk=4096):
    """One-shot TCP server feeding payload; returns (port, thread)."""
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def run():
        conn, _ = server.accept()
        for i in range(0, len(payload), chunk):
            conn.sendall(payload[i: i + chunk])
        conn.close()
        server.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return port, t


@pytest.mark.usefixtures("lib_ok")
class TestNativeIngest:
    def test_f32_integrity(self):
        rng = np.random.default_rng(0)
        iq = (rng.standard_normal(100000) + 1j * rng.standard_normal(100000)
              ).astype(np.complex64)
        port, _ = serve_bytes(iq.tobytes())
        ing = native.IqIngest(1 << 20)
        ing.connect("127.0.0.1", port)
        blocks = []
        total = 0
        while total < len(iq):
            blk = ing.read_block(20000, timeout=5)
            assert blk is not None
            blocks.append(blk)
            total += len(blk)
        got = np.concatenate(blocks)[: len(iq)]
        np.testing.assert_array_equal(got, iq)
        assert ing.overruns == 0
        ing.close()

    def test_s16_conversion(self):
        samples = np.array([0, 16384, -16384, 32767, -32768, 0], np.int16)
        port, _ = serve_bytes(samples.tobytes())
        ing = native.IqIngest(1 << 16)
        ing.connect("127.0.0.1", port, native.FORMAT_S16)
        blk = ing.read_block(3, timeout=5)
        np.testing.assert_allclose(blk.real, [0, -0.5, -1.0], atol=1e-4)
        np.testing.assert_allclose(blk.imag, [0.5, 32767 / 32768, 0], atol=1e-4)
        ing.close()

    def test_u8_conversion(self):
        samples = np.array([127, 255, 0, 127], np.uint8)
        port, _ = serve_bytes(samples.tobytes())
        ing = native.IqIngest(1 << 16)
        ing.connect("127.0.0.1", port, native.FORMAT_U8)
        blk = ing.read_block(2, timeout=5)
        assert abs(blk[0].real) < 0.01
        assert blk[0].imag > 0.99
        ing.close()

    def test_eof_and_timeout(self):
        port, _ = serve_bytes(np.zeros(8, np.float32).tobytes())  # 4 samples
        ing = native.IqIngest(1 << 16)
        ing.connect("127.0.0.1", port)
        blk = ing.read_block(4, timeout=5)
        assert blk is not None
        time.sleep(0.1)
        assert ing.eof
        assert ing.read_block(10, timeout=0.2) is None
        ing.close()

    def test_overrun_counts(self):
        iq = np.zeros(200000, np.complex64)
        port, _ = serve_bytes(iq.tobytes())
        ing = native.IqIngest(1 << 12)  # tiny ring: 4096 samples
        ing.connect("127.0.0.1", port)
        deadline = time.time() + 5
        while not ing.eof and time.time() < deadline:
            time.sleep(0.05)
        assert ing.overruns > 0
        # the freshest samples are still readable
        blk = ing.read_block(1024, timeout=1)
        assert blk is not None
        ing.close()

    def test_pipe_fd(self):
        r, w = os.pipe()
        iq = (np.arange(1000) + 1j * np.arange(1000)).astype(np.complex64)
        ing = native.IqIngest(1 << 16)
        ing.start_fd(r)
        os.write(w, iq.tobytes())
        os.close(w)
        blk = ing.read_block(1000, timeout=5)
        np.testing.assert_array_equal(blk, iq)
        ing.close()


def test_read_block_packed_u8_roundtrip():
    """u8 wire read (rtl-sdr convention): ±1.0 ↔ 127.4±128, quarter the
    host→device bytes (round 5)."""
    r, w = os.pipe()
    iq = (np.linspace(-1, 1, 256) + 1j * np.linspace(1, -1, 256)) \
        .astype(np.complex64)
    ing = native.IqIngest(1 << 16)
    ing.start_fd(r)
    os.write(w, iq.tobytes())
    os.close(w)
    blk = ing.read_block_packed_u8(256, timeout=5)
    assert blk.shape == (256, 2) and blk.dtype == np.uint8
    back = (blk.astype(np.float32) - 127.4) / 128.0
    assert np.allclose(back[:, 0], iq.real, atol=1 / 128)
    assert np.allclose(back[:, 1], iq.imag, atol=1 / 128)
    ing.close()


def test_pooled_buffer_rotation_distinct_after_shape_change():
    """Round-5 review regression: after a block-size change the pool must
    keep returning DISTINCT buffers (replacing the wrong slot made two
    consecutive reads alias one ndarray — corrupting in-flight blocks)."""
    r, w = os.pipe()
    ing = native.IqIngest(1 << 18)
    ing.set_blocking(True)
    ing.start_fd(r)
    data = np.zeros(40000, np.complex64).tobytes()
    os.write(w, data)
    # fill the pool at one size, then switch sizes
    for _ in range(10):
        assert ing.read_block_packed(1000, timeout=2) is not None
    seen = []
    for _ in range(10):
        b = ing.read_block_packed(1500, timeout=2)
        assert b is not None and b.shape == (1500, 2)
        seen.append(id(b))
    # consecutive reads never return the same buffer object
    assert all(seen[i] != seen[i + 1] for i in range(len(seen) - 1))
    os.close(w)
    ing.close()
