"""/api/lookup depth: callsign, MMSI and ICAO-hex entities with ISO codes
for flag rendering (VERDICT r3 item 8 / reference lib/Lookup.js data
surface served server-side)."""

import asyncio
import json

import pytest

from openwebrx_tpu.core.config import Config


async def _get_json(port, path):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    writer.write(f"GET {path} HTTP/1.1\r\nHost: x\r\nConnection: close"
                 "\r\n\r\n".encode())
    await writer.drain()
    head = await reader.readuntil(b"\r\n\r\n")
    body = await reader.read()
    writer.close()
    return int(head.split()[1]), json.loads(body)


@pytest.fixture()
def server():
    Config.reset()
    from openwebrx_tpu.web.http import HttpServer
    from openwebrx_tpu.web.server import build_router

    loop = asyncio.new_event_loop()
    srv = HttpServer(build_router(), port=0, host="127.0.0.1")
    loop.run_until_complete(srv.start())
    port = srv._server.sockets[0].getsockname()[1]
    yield loop, port
    loop.run_until_complete(srv.stop())
    loop.close()
    Config.reset()


class TestLookupApi:
    def test_callsign(self, server):
        loop, port = server
        status, info = loop.run_until_complete(
            _get_json(port, "/api/lookup?q=DL1ABC"))
        assert status == 200 and info["kind"] == "callsign"
        assert info["country"].startswith("Germany")
        assert info["ccode"] == "de"

    def test_mmsi_with_ccode(self, server):
        loop, port = server
        status, info = loop.run_until_complete(
            _get_json(port, "/api/lookup?q=211234567"))
        assert info["kind"] == "mmsi" and info["type"] == "ship"
        assert info["country"].startswith("Germany")
        assert info.get("ccode") == "de"

    def test_aircraft_hex(self, server):
        loop, port = server
        status, info = loop.run_until_complete(
            _get_json(port, "/api/lookup?q=3C4421&kind=aircraft"))
        assert info["kind"] == "aircraft"
        assert info["registration"] == "D-AAAA"
        assert info["ccode"] == "DE"

    def test_hex_callsign_not_misrouted(self, server):
        """DF1ABC is all-hex AND a valid German callsign — the heuristic
        path must return the callsign, not a fabricated aircraft."""
        loop, port = server
        status, info = loop.run_until_complete(
            _get_json(port, "/api/lookup?q=DF1ABC"))
        assert info["kind"] == "callsign"
        assert info["ccode"] == "de"

    def test_hex_non_callsign_is_aircraft(self, server):
        # A00001 is no callsign prefix → heuristic aircraft decode (N1)
        loop, port = server
        status, info = loop.run_until_complete(
            _get_json(port, "/api/lookup?q=A00001"))
        assert info["kind"] == "aircraft"
        assert info["registration"] == "N1"
