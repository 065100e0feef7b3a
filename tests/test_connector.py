"""ConnectorSource: IQ over TCP (native + python paths) and control socket."""

import socket
import threading
import time

import numpy as np
import pytest

from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.sources.connector import ConnectorSource


class FakeDriver:
    """Mimics an owrx_connector: serves float32 IQ, accepts prop:value."""

    def __init__(self):
        self.data_srv = socket.socket()
        self.data_srv.bind(("127.0.0.1", 0))
        self.data_srv.listen(1)
        self.ctrl_srv = socket.socket()
        self.ctrl_srv.bind(("127.0.0.1", 0))
        self.ctrl_srv.listen(1)
        self.data_port = self.data_srv.getsockname()[1]
        self.ctrl_port = self.ctrl_srv.getsockname()[1]
        self.control_lines = []
        self.stop = False
        self.iq = (np.arange(240000) % 100 / 100).astype(np.complex64)
        threading.Thread(target=self._serve_data, daemon=True).start()
        threading.Thread(target=self._serve_ctrl, daemon=True).start()

    def _serve_data(self):
        conn, _ = self.data_srv.accept()
        pos = 0
        try:
            while not self.stop:
                chunk = self.iq[pos % len(self.iq): pos % len(self.iq) + 8192]
                conn.sendall(chunk.tobytes())
                pos += len(chunk)
                time.sleep(0.002)
        except OSError:
            pass

    def _serve_ctrl(self):
        conn, _ = self.ctrl_srv.accept()
        buf = b""
        try:
            while not self.stop:
                data = conn.recv(1024)
                if not data:
                    break
                buf += data
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    self.control_lines.append(line.decode())
        except OSError:
            pass

    def close(self):
        self.stop = True
        for s in (self.data_srv, self.ctrl_srv):
            try:
                s.close()
            except OSError:
                pass


@pytest.mark.parametrize("force_python", [False, True])
def test_connector_stream_and_control(force_python):
    driver = FakeDriver()
    props = PropertyLayer(samp_rate=240000, center_freq=100000000,
                          host="127.0.0.1", port=driver.data_port,
                          control_port=driver.ctrl_port,
                          force_python_ingest=force_python)
    src = ConnectorSource("test", props)
    src.block_size = 24000
    src.start()
    try:
        blocks = []
        deadline = time.time() + 10
        while len(blocks) < 3 and time.time() < deadline:
            blk = src.read_block(timeout=1.0)
            if blk is not None:
                blocks.append(blk)
        assert len(blocks) >= 3
        if force_python:
            assert blocks[0].dtype == np.complex64
            b0 = blocks[0]
        else:
            # an f32 driver (the default) keeps the lossless float path —
            # the s16 wire packing is reserved for s16/u8-native SDRs or
            # an explicit iq_wire='s16' opt-in (ADVICE r3)
            assert blocks[0].dtype == np.complex64
            b0 = blocks[0]
        assert len(b0) == 24000
        # data continuity: the driver's ramp pattern appears
        assert np.isclose(b0[1].real - b0[0].real, 0.01, atol=1e-4) \
            or np.isclose(b0[1].real - b0[0].real, -0.99, atol=1e-4)

        # live retune goes through the control socket, no restart
        src.set_center_freq(101300000)
        deadline = time.time() + 5
        while not driver.control_lines and time.time() < deadline:
            time.sleep(0.05)
        assert "center_freq:101300000" in driver.control_lines
    finally:
        src.stop()
        driver.close()


def test_connector_s16_wire_optin():
    """iq_wire='s16' opts an f32 driver into packed int16 wire blocks
    (half the host→device bytes, explicit quantization opt-in)."""
    driver = FakeDriver()
    props = PropertyLayer(samp_rate=240000, center_freq=100000000,
                          host="127.0.0.1", port=driver.data_port,
                          control_port=driver.ctrl_port, iq_wire="s16")
    src = ConnectorSource("test-s16", props)
    src.block_size = 24000
    src.start()
    try:
        blk = None
        deadline = time.time() + 10
        while blk is None and time.time() < deadline:
            blk = src.read_block(timeout=1.0)
        from openwebrx_tpu.runtime.chain import host_as_complex64
        assert blk is not None
        assert blk.dtype == np.int16 and blk.shape[-1] == 2
        b0 = host_as_complex64(blk)
        assert np.isclose(b0[1].real - b0[0].real, 0.01, atol=1e-3) \
            or np.isclose(b0[1].real - b0[0].real, -0.99, atol=1e-3)
    finally:
        src.stop()
        driver.close()
