"""Settings + admin API: login, runtime config read/write, SDR management.

Reference: the settings web UI (``owrx/controllers/settings/`` + form
framework, SURVEY §2.1).  Round-1 surface is a JSON API with cookie-
session auth driving the same layered config (changes land in the dynamic
layer and persist through Config.store, firing property subscriptions so
running components reconfigure live); the HTML form generation can grow on
top of it.
"""

from __future__ import annotations

import json
import logging

from openwebrx_tpu.core.config import Config
from openwebrx_tpu.core.users import SessionStorage, UserList
from openwebrx_tpu.web.http import Request, json_response, response

logger = logging.getLogger(__name__)

# keys exposed for editing (reference: general settings sections)
EDITABLE_KEYS = [
    "receiver_name", "receiver_location", "receiver_asl", "receiver_admin",
    "receiver_gps", "photo_title", "photo_desc",
    "fft_fps", "fft_size", "fft_voverlap_factor",
    "audio_compression", "fft_compression",
    "waterfall_scheme", "waterfall_levels", "waterfall_auto_levels",
    "max_clients", "max_clients_per_ip", "allow_chat",
    "allow_audio_recording", "allow_center_freq_changes", "magic_key",
    "tuning_precision", "squelch_auto_margin",
    "services_enabled", "services_decoders",
    "decoding_queue_workers", "decoding_queue_length", "wsjt_decoding_depth",
    "pskreporter_enabled", "pskreporter_callsign",
    "wsprnet_enabled", "wsprnet_callsign",
    "aprs_callsign", "aprs_igate_enabled",
    "keep_files", "session_timeout", "ui_theme", "bot_ban_enabled",
    "tpu_block_seconds", "tpu_channel_capacity",
    "sdrs",
]


def _session_user(request: Request):
    cookies = request.headers.get("cookie", "")
    for part in cookies.split(";"):
        if "=" in part:
            k, v = part.strip().split("=", 1)
            if k == "owrx-session":
                data = SessionStorage.shared().get(v)
                if data is not None:
                    SessionStorage.shared().prolong(v)
                    return data.get("user")
    return None


def require_auth(handler):
    def wrapped(request: Request):
        if _session_user(request) is None:
            return json_response({"error": "unauthorized"}, status=401)
        return handler(request)
    return wrapped


def login(request: Request):
    try:
        body = json.loads(request.body or b"{}")
    except json.JSONDecodeError:
        return json_response({"error": "bad request"}, status=400)
    user = UserList.shared().authenticate(body.get("username", ""),
                                          body.get("password", ""))
    if user is None:
        return json_response({"error": "invalid credentials"}, status=401)
    key = SessionStorage.shared().create({"user": user.name})
    return response(
        200, json.dumps({"ok": True,
                         "must_change_password": user.must_change_password}).encode(),
        "application/json",
        {"Set-Cookie": f"owrx-session={key}; HttpOnly; Path=/"})


def logout(request: Request):
    cookies = request.headers.get("cookie", "")
    for part in cookies.split(";"):
        if part.strip().startswith("owrx-session="):
            SessionStorage.shared().invalidate(part.strip().split("=", 1)[1])
    return json_response({"ok": True})


@require_auth
def get_settings(request: Request):
    config = Config.get()
    return json_response({k: config.get(k) for k in EDITABLE_KEYS if k in config})


@require_auth
def update_settings(request: Request):
    try:
        body = json.loads(request.body or b"{}")
    except json.JSONDecodeError:
        return json_response({"error": "bad request"}, status=400)
    config = Config.get()
    rejected = [k for k in body if k not in EDITABLE_KEYS]
    if rejected:
        return json_response({"error": f"not editable: {rejected}"}, status=400)
    for k, v in body.items():
        config[k] = v
    Config.store()
    logger.info("settings updated by %s: %s", _session_user(request), list(body))
    return json_response({"ok": True})


def devices_api(request: Request):
    """Device-type catalog with settings schemas (reference
    SdrDeviceDescription.getInputs)."""
    from openwebrx_tpu.sources.devices import DEVICE_TYPES
    return json_response({t: {"name": d.name, "inputs": d.inputs(),
                              "requirement": d.requirement}
                          for t, d in DEVICE_TYPES.items()})


@require_auth
def logs_api(request: Request):
    from openwebrx_tpu.core.loghistory import HistoryHandler
    name = request.query.get("logger", "openwebrx_tpu")
    return json_response({"logger": name,
                          "lines": HistoryHandler.get_handler(name).get_lines()})


@require_auth
def settings_schema(request: Request):
    from openwebrx_tpu.web import forms
    return json_response(forms.schema())


@require_auth
def update_settings_page(request: Request):
    from openwebrx_tpu.web import forms
    page = request.matches.group(1)
    try:
        body = json.loads(request.body or b"{}")
        converted = forms.apply_page(page, body)
    except json.JSONDecodeError:
        return json_response({"error": "bad request"}, status=400)
    except (KeyError, ValueError) as e:
        return json_response({"error": str(e)}, status=400)
    Config.store()
    logger.info("settings page %s updated by %s: %s", page,
                _session_user(request), list(converted))
    return json_response({"ok": True, "applied": converted})


def get_bookmarks(request: Request):
    from openwebrx_tpu.core.bookmarks import Bookmarks
    return json_response([b.to_json() for b in Bookmarks.shared().get_bookmarks()])


@require_auth
def update_bookmarks(request: Request):
    """Replace the bookmark list (reference bookmarks settings editor)."""
    from openwebrx_tpu.core.bookmarks import Bookmark, Bookmarks
    try:
        body = json.loads(request.body or b"[]")
        if not isinstance(body, list):
            raise ValueError("expected a list")
        new = [Bookmark(item) for item in body]
    except (json.JSONDecodeError, ValueError, KeyError) as e:
        return json_response({"error": f"bad bookmarks: {e}"}, status=400)
    bookmarks = Bookmarks.shared()
    for old in list(bookmarks.get_bookmarks()):
        bookmarks.remove(old.name)
    for b in new:
        bookmarks.add(b)
    bookmarks.store()
    logger.info("bookmarks replaced by %s (%d entries)",
                _session_user(request), len(new))
    return json_response({"ok": True, "count": len(new)})


@require_auth
async def profile_api(request: Request):
    """Capture a JAX device profile (SURVEY §5.1 tracing/profiling build
    target).  ?seconds=N (max 10) traces all device programs; the trace
    directory path comes back for TensorBoard / xprof inspection."""
    import asyncio
    import tempfile
    import time as _time

    try:
        seconds = min(10.0, float(request.query.get("seconds", "1")))
    except (TypeError, ValueError):
        seconds = 1.0
    out_dir = tempfile.mkdtemp(prefix="owrx-jax-trace-")

    def capture():
        import jax
        with jax.profiler.trace(out_dir):
            _time.sleep(seconds)

    await asyncio.to_thread(capture)
    return json_response({"trace_dir": out_dir, "seconds": seconds})


def register_routes(router):
    router.add("/api/devices", devices_api)
    router.add("/api/logs", logs_api)
    router.add("/api/profile", profile_api, method="POST")
    router.add("/login", login, method="POST")
    router.add("/logout", logout, method="POST")
    router.add("/api/settings", get_settings)
    router.add("/api/settings", update_settings, method="POST")
    router.add("/api/settings/schema", settings_schema)
    router.add_regex(r"^/api/settings/(general|decoding|background|reporting)$",
                     update_settings_page, method="POST")
    router.add("/api/bookmarks", get_bookmarks)
    router.add("/api/bookmarks", update_bookmarks, method="POST")
