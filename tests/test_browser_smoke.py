"""Headless-browser smoke test (VERDICT r3 item 8): connect, receive
0x01 (waterfall) + 0x02 (audio), render — catching regressions in the
frontend JS that protocol-level tests can't see.

Runs when a driveable browser is available (playwright, or a system
chromium via selenium); skipped otherwise (this build image ships no JS
engine at all — checked explicitly so CI with a browser runs it)."""

import json
import os
import shutil
import socket
import subprocess
import sys
import threading
import time

import pytest


def _browser_available():
    try:
        import playwright.sync_api  # noqa: F401
        return True
    except ImportError:
        pass
    return any(shutil.which(b) for b in
               ("chromium", "chromium-browser", "google-chrome", "chrome"))


pytestmark = pytest.mark.skipif(
    not _browser_available(),
    reason="no headless browser in this image (playwright/chromium absent)")


@pytest.fixture()
def demo_server():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    srv = subprocess.Popen(
        [sys.executable, "-m", "openwebrx_tpu.web.server",
         "--port", "8191", "--signal-demo"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    threading.Thread(target=lambda: [None for _ in srv.stdout],
                     daemon=True).start()
    for _ in range(240):
        try:
            s = socket.create_connection(("127.0.0.1", 8191), 0.5)
            s.close()
            break
        except OSError:
            time.sleep(0.5)
    else:
        srv.kill()
        pytest.fail("demo server never came up")
    yield "http://127.0.0.1:8191"
    srv.terminate()


class TestBrowserSmoke:
    def test_waterfall_and_audio_flow(self, demo_server):
        from playwright.sync_api import sync_playwright

        with sync_playwright() as pw:
            browser = pw.chromium.launch()
            page = browser.new_page()
            errors = []
            page.on("pageerror", lambda e: errors.append(str(e)))
            page.goto(demo_server, wait_until="networkidle")
            # the app object exists and the socket opens
            page.wait_for_function(
                "window.app && app.ws && app.ws.readyState === 1",
                timeout=30000)
            # waterfall rows arrive (0x01) and paint non-background pixels
            page.wait_for_function(
                "app.lastFrame > 0", timeout=30000)
            painted = page.evaluate("""() => {
                const c = document.getElementById('waterfall');
                const ctx = c.getContext('2d');
                const d = ctx.getImageData(0, 0, c.width, 4).data;
                let lit = 0;
                for (let i = 0; i < d.length; i += 4)
                    if (d[i] || d[i+1] || d[i+2]) lit++;
                return lit;
            }""")
            assert painted > 100, "waterfall canvas not painting"
            # audio frames decode (0x02 → AudioEngine byte counter)
            page.wait_for_function(
                "app.audio.getStats && app.audio.getStats().bytes > 0",
                timeout=30000)
            # passband element tracks the dial (drag surface present)
            assert page.evaluate(
                "getComputedStyle(document.getElementById('passband'))"
                ".pointerEvents") == "auto"
            # clock ticks, connection dot green-ish
            assert "UTC" in page.text_content("#clock")
            assert not errors, f"JS errors: {errors[:3]}"
            browser.close()
