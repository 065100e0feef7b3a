"""Settings API: login, auth gating, live config updates."""

import asyncio
import json

import pytest

from openwebrx_tpu.core.config import Config
from openwebrx_tpu.core.users import UserList, SessionStorage


@pytest.fixture()
def admin_user(tmp_path, monkeypatch):
    Config.reset()
    ul = UserList(str(tmp_path / "users.json"))
    ul.add_user("admin", "secret")
    from openwebrx_tpu.core import users as users_mod
    monkeypatch.setattr(users_mod.UserList, "shared", staticmethod(lambda: ul))
    SessionStorage._instance = None
    yield
    Config.reset()


async def http(port, method, path, body=None, cookie=None):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    payload = json.dumps(body).encode() if body is not None else b""
    headers = [f"{method} {path} HTTP/1.1", "Host: t",
               f"Content-Length: {len(payload)}", "Connection: close"]
    if cookie:
        headers.append(f"Cookie: {cookie}")
    writer.write(("\r\n".join(headers) + "\r\n\r\n").encode() + payload)
    await writer.drain()
    raw = b""
    while True:
        chunk = await reader.read(65536)
        if not chunk:
            break
        raw += chunk
    writer.close()
    head, _, body_out = raw.partition(b"\r\n\r\n")
    status = int(head.split(b" ")[1])
    set_cookie = None
    for line in head.split(b"\r\n"):
        if line.lower().startswith(b"set-cookie:"):
            set_cookie = line.split(b":", 1)[1].split(b";")[0].strip().decode()
    return status, body_out, set_cookie


@pytest.mark.usefixtures("admin_user")
class TestSettingsApi:
    def test_auth_and_update(self):
        asyncio.run(self._run())

    async def _run(self):
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            status, _, _ = await http(port, "GET", "/api/settings")
            assert status == 401

            status, _, _ = await http(port, "POST", "/login",
                                      {"username": "admin", "password": "wrong"})
            assert status == 401

            status, _, cookie = await http(port, "POST", "/login",
                                           {"username": "admin",
                                            "password": "secret"})
            assert status == 200 and cookie

            status, body, _ = await http(port, "GET", "/api/settings",
                                         cookie=cookie)
            assert status == 200
            settings = json.loads(body)
            assert "receiver_name" in settings

            status, _, _ = await http(port, "POST", "/api/settings",
                                      {"receiver_name": "TPU-RX"}, cookie=cookie)
            assert status == 200
            assert Config.get()["receiver_name"] == "TPU-RX"

            # non-editable keys rejected
            status, _, _ = await http(port, "POST", "/api/settings",
                                      {"version": 99}, cookie=cookie)
            assert status == 400

            # settings page served
            status, body, _ = await http(port, "GET", "/settings.html")
            assert status == 200 and b"Settings" in body
        finally:
            await server.stop()


@pytest.mark.usefixtures("admin_user")
class TestSchemaForms:
    def test_schema_and_page_updates(self):
        asyncio.run(self._run())

    async def _run(self):
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            _, _, cookie = await http(port, "POST", "/login",
                                      {"username": "admin",
                                       "password": "secret"})
            status, body, _ = await http(port, "GET", "/api/settings/schema",
                                         cookie=cookie)
            assert status == 200
            schema = json.loads(body)
            assert {"general", "decoding", "background",
                    "reporting"} <= set(schema)
            general = schema["general"]
            keys = [f["key"] for s in general["sections"] for f in s["fields"]]
            assert "receiver_name" in keys and "fft_fps" in keys
            assert general["values"]["max_clients"] is not None

            # typed update with coercion ("25" → 25)
            status, body, _ = await http(
                port, "POST", "/api/settings/general",
                {"max_clients": "25", "allow_chat": False}, cookie=cookie)
            assert status == 200
            assert Config.get()["max_clients"] == 25
            assert Config.get()["allow_chat"] is False

            # validation: out-of-range number rejected
            status, _, _ = await http(port, "POST", "/api/settings/general",
                                      {"fft_fps": 500}, cookie=cookie)
            assert status == 400

            # validation: field not on the page rejected
            status, _, _ = await http(port, "POST", "/api/settings/general",
                                      {"mqtt_host": "evil"}, cookie=cookie)
            assert status == 400

            # auth required
            status, _, _ = await http(port, "POST", "/api/settings/general",
                                      {"max_clients": 1})
            assert status == 401
        finally:
            await server.stop()

    def test_bookmarks_roundtrip(self):
        asyncio.run(self._run_bookmarks())

    async def _run_bookmarks(self):
        import tempfile

        from openwebrx_tpu.core.bookmarks import Bookmarks
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        Bookmarks._instance = Bookmarks(
            tempfile.mktemp(suffix="-bookmarks.json"))
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            _, _, cookie = await http(port, "POST", "/login",
                                      {"username": "admin",
                                       "password": "secret"})
            new = [{"name": "DLF", "frequency": 6190000,
                    "modulation": "am"}]
            status, body, _ = await http(port, "POST", "/api/bookmarks",
                                         new, cookie=cookie)
            assert status == 200 and json.loads(body)["count"] == 1
            status, body, _ = await http(port, "GET", "/api/bookmarks")
            assert status == 200
            got = json.loads(body)
            assert got[0]["name"] == "DLF"
        finally:
            await server.stop()
            Bookmarks._instance = None


@pytest.mark.usefixtures("admin_user")
class TestSdrCrud:
    """Create/edit/delete SDR devices + profiles entirely over the API
    (reference owrx/controllers/settings/sdr.py device/profile forms)."""

    def test_device_profile_lifecycle(self):
        asyncio.run(self._run())

    async def _run(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.server import build_router
        from openwebrx_tpu.web.http import HttpServer

        SdrService.reset()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            _, _, cookie = await http(port, "POST", "/login",
                                      {"username": "admin",
                                       "password": "secret"})

            # schema advertises per-type device + profile forms
            status, body, _ = await http(port, "GET", "/api/sdrs/schema",
                                         cookie=cookie)
            assert status == 200
            schema = json.loads(body)
            assert "rtl_sdr" in schema and "sddc_soapy" in schema
            keys = [f["key"] for f in schema["rtl_sdr"]["device_fields"]]
            assert "name" in keys and "ppm" in keys and "bias_tee" in keys
            pkeys = [f["key"] for f in schema["rtl_sdr"]["profile_fields"]]
            assert "center_freq" in pkeys and "samp_rate" in pkeys

            # unauthenticated writes rejected
            status, _, _ = await http(port, "POST", "/api/sdrs",
                                      {"type": "signal", "name": "x"})
            assert status == 401

            # create a device
            status, body, _ = await http(
                port, "POST", "/api/sdrs",
                {"type": "signal", "name": "Test Signal", "enabled": True},
                cookie=cookie)
            assert status == 200, body
            sdr_id = json.loads(body)["id"]
            sdrs = Config.get()["sdrs"]
            entry = dict(sdrs[sdr_id].items()) if hasattr(
                sdrs[sdr_id], "items") else sdrs[sdr_id]
            assert entry["name"] == "Test Signal"

            # bad type / missing name rejected
            status, _, _ = await http(port, "POST", "/api/sdrs",
                                      {"type": "warp_drive", "name": "x"},
                                      cookie=cookie)
            assert status == 400
            status, _, _ = await http(port, "POST", "/api/sdrs",
                                      {"type": "signal"}, cookie=cookie)
            assert status == 400

            # device listed with live state
            status, body, _ = await http(port, "GET", "/api/sdrs",
                                         cookie=cookie)
            listing = json.loads(body)
            assert sdr_id in listing and "state" in listing[sdr_id]

            # edit device fields (validated)
            status, body, _ = await http(port, "POST", f"/api/sdrs/{sdr_id}",
                                         {"name": "Renamed"}, cookie=cookie)
            assert status == 200
            status, _, _ = await http(port, "POST", f"/api/sdrs/{sdr_id}",
                                      {"nonsense_key": 1}, cookie=cookie)
            assert status == 400

            # add a profile (required fields enforced)
            status, _, _ = await http(port, "POST",
                                      f"/api/sdrs/{sdr_id}/profiles",
                                      {"name": "2m"}, cookie=cookie)
            assert status == 400
            status, body, _ = await http(
                port, "POST", f"/api/sdrs/{sdr_id}/profiles",
                {"name": "2m", "center_freq": 145000000,
                 "samp_rate": 2400000, "start_mod": "nfm"}, cookie=cookie)
            assert status == 200, body
            pid = json.loads(body)["id"]

            # edit the profile; dropdown validation applies
            status, _, _ = await http(
                port, "POST", f"/api/sdrs/{sdr_id}/profiles/{pid}",
                {"start_mod": "nope"}, cookie=cookie)
            assert status == 400
            status, _, _ = await http(
                port, "POST", f"/api/sdrs/{sdr_id}/profiles/{pid}",
                {"start_freq": 145500000}, cookie=cookie)
            assert status == 200

            # live apply: the registry re-instantiated the source with the
            # new profile
            src = SdrService.get_sources().get(sdr_id)
            assert src is not None
            assert pid in src.get_profiles()

            # delete profile, then device
            status, _, _ = await http(
                port, "POST", f"/api/sdrs/{sdr_id}/profiles/{pid}/delete",
                cookie=cookie)
            assert status == 200
            status, _, _ = await http(port, "POST",
                                      f"/api/sdrs/{sdr_id}/delete",
                                      cookie=cookie)
            assert status == 200
            sdrs = Config.get()["sdrs"]
            contains = (sdr_id in dict(sdrs.items())) if hasattr(
                sdrs, "items") else (sdr_id in sdrs)
            assert not contains
            assert sdr_id not in SdrService.get_sources()
        finally:
            await server.stop()
            SdrService.reset()
