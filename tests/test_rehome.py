"""Client re-home on SDR failure (VERDICT r3 item 4).

Reference behavior: owrx/connection.py:292-305 + owrx/source/__init__.py:
224-227 — when a source fails, its listeners get an sdr_error message and
migrate to the next available SDR with audio flowing, instead of being
stranded on a dead device.
"""

import asyncio
import json

import pytest

from openwebrx_tpu.core.config import Config
from tests.test_server import WsTestClient


@pytest.fixture()
def two_device_config():
    Config.reset()
    config = Config.get()

    def dev(center):
        return {
            "name": f"Dev {center}", "type": "signal",
            "samp_rate": 240000, "center_freq": center,
            "throttle": False, "noise": 1e-4,
            "signals": [{"kind": "nfm", "offset_hz": 14500.0,
                         "f_audio": 1000.0, "amplitude": 0.5}],
            "profiles": {
                "default": {"name": "Default", "center_freq": center,
                            "samp_rate": 240000,
                            "start_freq": center + 14500,
                            "start_mod": "nfm"},
            },
        }

    config["sdrs"] = {"alpha": dev(145000000), "beta": dev(433000000)}
    yield config
    from openwebrx_tpu.sdr import SdrService
    SdrService.stop_all()
    Config.reset()


@pytest.mark.usefixtures("two_device_config")
class TestClientRehome:
    def test_client_migrates_on_source_failure(self):
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.http import HttpServer
        from openwebrx_tpu.web.server import build_router

        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()      # CLIENT DE SERVER
            await client.send_text("SERVER DE CLIENT client=t type=receiver")
            config = await client.expect_json("config")
            assert config["value"]["center_freq"] == 145000000  # on alpha
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": 14500, "squelch_level": -150}}))
            audio = await client.collect_binary(0x02, 2)
            assert audio                                       # audio on alpha

            # kill alpha mid-stream (driver monitor marks a died driver
            # failed after its retry budget; fail() is that terminal state)
            alpha = SdrService.get_sources()["alpha"]
            alpha.fail()

            # the client hears about it…
            err = await client.expect_json("sdr_error", timeout=10)
            assert "alpha" in err["value"]
            # …lands on beta (fresh config push with beta's center)…
            async def _wait_beta_config():
                while True:
                    opcode, payload = await client.receive()
                    if opcode == 0x1:
                        msg = json.loads(payload)
                        if msg.get("type") == "config" and \
                                msg["value"].get("center_freq") == 433000000:
                            return msg
            await asyncio.wait_for(_wait_beta_config(), 10)
            # …with audio flowing again from the new device's chain
            audio2 = await client.collect_binary(0x02, 3, timeout=20)
            assert audio2 and b"SYNC" in b"".join(audio2)
            await client.close()
        finally:
            await server.stop()
            from openwebrx_tpu.sdr import SdrService as S
            S.stop_all()

    def test_no_device_left(self):
        asyncio.run(self._all_fail())

    async def _all_fail(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.http import HttpServer
        from openwebrx_tpu.web.server import build_router

        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()
            await client.send_text("SERVER DE CLIENT client=t type=receiver")
            await client.expect_json("config")
            # both devices die → the client gets the reference's
            # "No SDR Devices available" error, connection stays up
            for src in SdrService.get_sources().values():
                src.fail()
            seen = set()
            async def _wait_no_devices():
                while True:
                    opcode, payload = await client.receive()
                    if opcode == 0x1:
                        msg = json.loads(payload)
                        if msg.get("type") == "sdr_error":
                            seen.add(msg["value"])
                            if "No SDR Devices available" in seen:
                                return
            await asyncio.wait_for(_wait_no_devices(), 10)
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()
