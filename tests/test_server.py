"""End-to-end server protocol test: boot the server on a synthetic source,
connect over a real WebSocket, complete the reference handshake, and
verify config/modes/profiles JSON plus binary FFT (0x01) and ADPCM audio
(0x02) frames arrive; exercise retune and mode switch live."""

import asyncio
import base64
import json
import os
import struct

import numpy as np
import pytest

from openwebrx_tpu.core.config import Config


@pytest.fixture()
def demo_config(tmp_path):
    Config.reset()
    config = Config.get()
    config["sdrs"] = {
        "demo": {
            "name": "Test Demo", "type": "signal",
            "samp_rate": 240000, "center_freq": 145000000,
            "throttle": False, "noise": 1e-4,
            "signals": [
                {"kind": "nfm", "offset_hz": 14500.0, "f_audio": 1000.0,
                 "amplitude": 0.5},
            ],
            "profiles": {
                "default": {"name": "Demo", "center_freq": 145000000,
                            "samp_rate": 240000, "start_freq": 145014500,
                            "start_mod": "nfm"},
            },
        }
    }
    yield config
    from openwebrx_tpu.sdr import SdrService
    SdrService.stop_all()
    Config.reset()


class WsTestClient:
    """Tiny RFC6455 client for protocol tests."""

    def __init__(self, reader, writer):
        self.reader = reader
        self.writer = writer

    @classmethod
    async def connect(cls, port, path="/ws/"):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        key = base64.b64encode(os.urandom(16)).decode()
        writer.write((f"GET {path} HTTP/1.1\r\nHost: localhost\r\n"
                      "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                      f"Sec-WebSocket-Key: {key}\r\n"
                      "Sec-WebSocket-Version: 13\r\n\r\n").encode())
        await writer.drain()
        head = await reader.readuntil(b"\r\n\r\n")
        assert b"101" in head.split(b"\r\n")[0]
        return cls(reader, writer)

    async def send_text(self, text: str):
        await self._send(0x1, text.encode())

    async def _send(self, opcode, payload):
        mask = os.urandom(4)
        head = bytearray([0x80 | opcode])
        n = len(payload)
        if n < 126:
            head.append(0x80 | n)
        else:
            head.append(0x80 | 126)
            head += struct.pack(">H", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self.writer.write(bytes(head) + mask + masked)
        await self.writer.drain()

    async def receive(self):
        while True:
            head = await self.reader.readexactly(2)
            opcode = head[0] & 0x0F
            length = head[1] & 0x7F
            if length == 126:
                length, = struct.unpack(">H", await self.reader.readexactly(2))
            elif length == 127:
                length, = struct.unpack(">Q", await self.reader.readexactly(8))
            payload = await self.reader.readexactly(length) if length else b""
            if opcode == 0x9:  # ping
                await self._send(0xA, payload)
                continue
            return opcode, payload

    async def expect_json(self, msg_type, timeout=10):
        async def _wait():
            while True:
                opcode, payload = await self.receive()
                if opcode == 0x1:
                    msg = json.loads(payload)
                    if msg.get("type") == msg_type:
                        return msg
        return await asyncio.wait_for(_wait(), timeout)

    async def collect_binary(self, prefix, count, timeout=30):
        frames = []

        async def _wait():
            while len(frames) < count:
                opcode, payload = await self.receive()
                if opcode == 0x2 and payload and payload[0] == prefix:
                    frames.append(payload[1:])
            return frames
        return await asyncio.wait_for(_wait(), timeout)

    async def close(self):
        self.writer.close()


@pytest.mark.usefixtures("demo_config")
class TestServerEndToEnd:
    def test_full_session(self):
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        import sys

        def mark(s):
            # progress marks surface in pytest output on hang/failure
            print("STEP:", s, file=sys.stderr, flush=True)
        try:
            client = await WsTestClient.connect(port)
            opcode, payload = await client.receive()
            assert payload.decode().startswith("CLIENT DE SERVER")
            await client.send_text("SERVER DE CLIENT client=test type=receiver")

            mark("handshake")
            details = await client.expect_json("receiver_details")
            assert "receiver_name" in details["value"]
            modes = await client.expect_json("modes")
            mods = [m["modulation"] for m in modes["value"]]
            assert {"nfm", "am", "usb", "lsb", "cw", "sam", "wfm"} <= set(mods)
            profiles = await client.expect_json("profiles")
            assert profiles["value"][0]["id"] == "demo|default"
            mark("got modes+profiles")
            config = await client.expect_json("config")
            assert config["value"]["samp_rate"] == 240000
            assert config["value"]["center_freq"] == 145000000

            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": 14500, "squelch_level": -150}}))

            mark("start sent")
            # binary waterfall + audio + smeter must flow
            fft_frames = await client.collect_binary(0x01, 3)
            assert all(len(f) > 1000 for f in fft_frames)
            mark("fft collected")
            audio = await client.collect_binary(0x02, 2)
            # SYNC headers recur every 1001 data bytes — not per frame
            assert b"SYNC" in b"".join(audio)
            mark("audio collected")
            smeter = await client.expect_json("smeter")
            assert isinstance(smeter["value"], float)

            mark("smeter ok")
            # decode one ADPCM-compressed FFT row and find the tone
            from openwebrx_tpu.ops.adpcm import adpcm_decode_np, COMPRESS_FFT_PAD_N
            row_i16, _ = adpcm_decode_np(bytes(fft_frames[-1]))
            row = row_i16[COMPRESS_FFT_PAD_N:].astype(np.float32) / 100
            assert len(row) >= 4096
            peak = int(np.argmax(row[:4096]))
            expected = 2048 + round(14500 / 240000 * 4096)
            # FM deviation 3 kHz spreads the carrier ±51 bins at this rate
            assert abs(peak - expected) <= 60

            mark("peak ok")
            # live mode switch via dspcontrol params
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "params": {"mod": "am"}}))
            audio2 = await client.collect_binary(0x02, 2)
            assert audio2
            mark("all ok")
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()


@pytest.mark.usefixtures("demo_config")
class TestSecondaryDemod:
    def test_psk31_text_over_protocol(self):
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        # add a PSK31 signal to the demo source config
        cfg = Config.get()
        sdrs = dict(cfg["sdrs"])
        sdrs["demo"]["signals"].append(
            {"kind": "psk", "offset_hz": -60000.0, "amplitude": 0.5,
             "text": "cq de tpu "})
        cfg["sdrs"] = sdrs
        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()  # CLIENT DE SERVER
            await client.send_text("SERVER DE CLIENT client=test type=receiver")
            await client.expect_json("config")
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": -60000, "mod": "bpsk31"}}))
            await client.expect_json("secondary_config")
            # collect decoded text until the message appears
            text = ""
            async def gather():
                nonlocal text
                while "cq de tpu" not in text:
                    msg = await client.expect_json("secondary_demod", timeout=60)
                    text += msg["value"]
            await asyncio.wait_for(gather(), 90)
            assert "cq de tpu" in text
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()


@pytest.mark.usefixtures("demo_config")
class TestChatAndClients:
    def test_chat_broadcast_between_clients(self):
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.core.clients import ClientRegistry
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        ClientRegistry.reset()
        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            a = await WsTestClient.connect(port)
            b = await WsTestClient.connect(port)
            for c in (a, b):
                await c.receive()
                await c.send_text("SERVER DE CLIENT client=test type=receiver")
                await c.expect_json("config")
            # both see the listener count reach 2
            await a.expect_json("clients")
            await a.send_text(json.dumps(
                {"type": "sendmessage", "text": "hello all", "name": "op"}))
            msg = await b.expect_json("chat_message")
            assert msg["text"] == "hello all" and msg["name"] == "op"
            msg_a = await a.expect_json("chat_message")
            assert msg_a["text"] == "hello all"
            await a.close()
            await b.close()
        finally:
            await server.stop()
            SdrService.stop_all()
            ClientRegistry.reset()


class TestPacketModeOverProtocol:
    """Interactive packet listening: NFM bank slot → native AFSK/HDLC →
    APRS events on the secondary_demod stream (no direwolf binary)."""

    def test_aprs_beacon_decoded(self):
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        Config.reset()
        cfg = Config.get()
        cfg["sdrs"] = {
            "demo": {
                "name": "Packet Demo", "type": "signal",
                "samp_rate": 240000, "center_freq": 144800000,
                "throttle": False, "noise": 1e-4,
                "signals": [
                    {"kind": "packet", "offset_hz": 14500.0,
                     "amplitude": 0.5, "source": "W1TST-9",
                     "info": "!4903.50N/07201.75W-protocol test"},
                ],
                "profiles": {
                    "default": {"name": "Demo", "center_freq": 144800000,
                                "samp_rate": 240000,
                                "start_freq": 144814500,
                                "start_mod": "nfm"},
                },
            }
        }
        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()
            await client.send_text("SERVER DE CLIENT client=test type=receiver")
            await client.expect_json("config")
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": 14500, "mod": "packet"}}))
            text = ""
            async def gather():
                nonlocal text
                while "W1TST-9" not in text:
                    msg = await client.expect_json("secondary_demod",
                                                   timeout=60)
                    text += msg["value"]
            await asyncio.wait_for(gather(), 90)
            event = json.loads([l for l in text.splitlines()
                                if "W1TST-9" in l][0])
            assert event["mode"] == "APRS"
            assert event["source"] == "W1TST-9"
            assert abs(event.get("lat", 0) - 49.0583) < 0.01
            # switching back to the underlying analog mode must detach the
            # decoder and resume bank audio (regression: the effective-mode
            # check, not handle.mode, gates the switch)
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": 14500, "mod": "nfm"}}))
            audio = await client.collect_binary(0x02, 3, timeout=60)
            assert len(audio) == 3
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()
            Config.reset()


class TestInteractiveFt8:
    """Interactive chopper listener: secondary_mod=ft8 attaches an interval
    chopper on the client's dial; decoder-queue spots stream to the panel
    as JSON and reach the map (reference AudioChopperDemodulator)."""

    def test_ft8_spots_over_protocol(self, tmp_path, monkeypatch):
        import stat

        script = tmp_path / "fake_jt9"
        script.write_text(
            "#!/bin/sh\n"
            "echo '222100 -15 -0.0  508 ~  CQ EA7MJ IM66'\n"
            "echo '<DecodeFinished>  0  1'\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)

        from openwebrx_tpu.services import wsjt as wsjt_mod
        from openwebrx_tpu.services.wsjt import Ft8Profile

        class FastProfile(Ft8Profile):
            interval = 1

            def decoder_commandline(self, file):
                return [str(script), file]

        monkeypatch.setattr(wsjt_mod, "enabled_profiles",
                            lambda mode: [FastProfile()] if mode == "ft8" else [])
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.core.map import Map
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.services.queue import DecoderQueue
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        Config.reset()
        cfg = Config.get()
        cfg["sdrs"] = {
            "demo": {
                "name": "FT8 Demo", "type": "signal",
                "samp_rate": 240000, "center_freq": 14074000,
                "throttle": False, "noise": 1e-4,
                "signals": [
                    {"kind": "usb", "offset_hz": 0.0, "f_audio": 800.0,
                     "amplitude": 0.3},
                ],
                "profiles": {
                    "default": {"name": "Demo", "center_freq": 14074000,
                                "samp_rate": 240000, "start_freq": 14074000,
                                "start_mod": "usb"},
                },
            }
        }
        DecoderQueue.reset()
        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()
            await client.send_text("SERVER DE CLIENT client=test type=receiver")
            await client.expect_json("config")
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"mod": "usb", "secondary_mod": "ft8",
                            "offset_freq": 0}}))
            await client.expect_json("secondary_config", timeout=30)
            text = ""
            async def gather():
                nonlocal text
                while "EA7MJ" not in text:
                    msg = await client.expect_json("secondary_demod",
                                                   timeout=60)
                    text += msg["value"]
            await asyncio.wait_for(gather(), 90)
            spot = json.loads([l for l in text.splitlines()
                               if "EA7MJ" in l][0])
            assert spot["callsign"] == "EA7MJ"
            assert spot["locator"] == "IM66"
            assert spot["mode"] == "FT8"
            assert spot["freq"] == 14074508
            # the spot also lands on the shared map (report_spot runs in
            # the decoder-queue worker right after the panel push — poll)
            for _ in range(100):
                if "EA7MJ" in Map.shared().positions:
                    break
                await asyncio.sleep(0.05)
            assert "EA7MJ" in Map.shared().positions
            # detach cleanly
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "params": {"secondary_mod": ""}}))
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()
            DecoderQueue.reset()
            Config.reset()


class TestInteractiveIqExec:
    """Interactive IQ-exec mode (ISM): complex-IF tap feeds the external
    decoder's stdin; its JSON events stream to the panel."""

    def test_ism_events_over_protocol(self, tmp_path, monkeypatch):
        import stat

        script = tmp_path / "fake_rtl433"
        script.write_text(
            "#!/bin/sh\n"
            "head -c 4096 > /dev/null\n"           # consume some IQ
            'echo \'{"model":"Acurite-Tower","id":1234,"temperature_C":21.5}\'\n'
            "cat > /dev/null\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)

        from openwebrx_tpu.services import exec_modes
        spec = dict(exec_modes.IQ_EXEC_MODES["ism"])
        spec["command"] = lambda rate, dial: [str(script)]
        monkeypatch.setitem(exec_modes.IQ_EXEC_MODES, "ism", spec)
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        Config.reset()
        cfg = Config.get()
        cfg["sdrs"] = {
            "demo": {
                "name": "ISM Demo", "type": "signal",
                "samp_rate": 1200000, "center_freq": 433920000,
                "throttle": False, "noise": 1e-3,
                "signals": [],
                "profiles": {
                    "default": {"name": "Demo", "center_freq": 433920000,
                                "samp_rate": 1200000,
                                "start_freq": 433920000,
                                "start_mod": "nfm"},
                },
            }
        }
        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()
            await client.send_text("SERVER DE CLIENT client=test type=receiver")
            await client.expect_json("config")
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": 0, "mod": "ism"}}))
            text = ""
            async def gather():
                nonlocal text
                while "Acurite" not in text:
                    msg = await client.expect_json("secondary_demod",
                                                   timeout=60)
                    text += msg["value"]
            await asyncio.wait_for(gather(), 90)
            ev = json.loads([l for l in text.splitlines()
                             if "Acurite" in l][0])
            assert ev["mode"] == "ISM"
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()
            Config.reset()
