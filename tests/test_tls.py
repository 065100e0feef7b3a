"""TLS auto-enable for the web server."""

import asyncio
import json
import ssl
import subprocess
import urllib.request

import pytest

from openwebrx_tpu.core.config import CoreConfig
from openwebrx_tpu.web.http import HttpServer, Router, json_response


@pytest.fixture()
def certs(tmp_path):
    cert, key = tmp_path / "cert.pem", tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout",
         str(key), "-out", str(cert), "-days", "2", "-nodes",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)
    return str(cert), str(key)


class TestTls:
    def test_https_roundtrip(self, certs, monkeypatch):
        monkeypatch.setitem(CoreConfig.defaults, "ssl_cert", certs[0])
        monkeypatch.setitem(CoreConfig.defaults, "ssl_key", certs[1])
        from openwebrx_tpu.web.server import make_ssl_context
        ctx = make_ssl_context()
        assert ctx is not None

        router = Router()
        router.add("/ping", lambda req: json_response({"ok": True}))

        async def run():
            server = HttpServer(router, 0, "127.0.0.1", ssl_context=ctx)
            await server.start()
            port = server._server.sockets[0].getsockname()[1]
            loop = asyncio.get_event_loop()

            def fetch():
                cctx = ssl.create_default_context()
                cctx.check_hostname = False
                cctx.verify_mode = ssl.CERT_NONE
                with urllib.request.urlopen(
                        f"https://127.0.0.1:{port}/ping", context=cctx,
                        timeout=5) as r:
                    return r.status, json.loads(r.read())
            st, body = await loop.run_in_executor(None, fetch)
            await server.stop()
            return st, body

        st, body = asyncio.run(run())
        assert st == 200 and body == {"ok": True}

    def test_no_certs_means_plain_http(self, monkeypatch, tmp_path):
        monkeypatch.setitem(CoreConfig.defaults, "ssl_cert",
                            str(tmp_path / "nope.pem"))
        monkeypatch.setitem(CoreConfig.defaults, "ssl_key",
                            str(tmp_path / "nope.key"))
        from openwebrx_tpu.web.server import make_ssl_context
        assert make_ssl_context() is None
