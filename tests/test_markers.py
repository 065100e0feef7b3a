"""Markers: static files + loader registry → permanent map entries."""

import json
import time

import pytest

from openwebrx_tpu.core.config import CoreConfig
from openwebrx_tpu.core.map import Map
from openwebrx_tpu.core.markers import MarkerLocation, Markers, PERMANENT_MS


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setitem(CoreConfig.defaults, "data_directory", str(tmp_path))
    Map._instance = None
    Markers._instance = None
    saved = dict(Markers.loaders)
    Markers.loaders.clear()
    yield tmp_path
    Markers.loaders.clear()
    Markers.loaders.update(saved)
    Markers._instance = None
    Map._instance = None


class TestMarkers:
    def test_static_files_and_markers_d(self, env):
        (env / "markers.json").write_text(json.dumps({
            "tower-1": {"id": "tower-1", "mode": "Stations",
                        "lat": 50.0, "lon": 8.0, "comment": "Test tower"}}))
        d = env / "markers.d"
        d.mkdir()
        (d / "extra.json").write_text(json.dumps({
            "beacon-1": {"id": "beacon-1", "mode": "Stations",
                         "lat": 51.0, "lon": 9.0}}))
        Markers.shared().refresh()
        pos = Map.shared().positions
        assert "tower-1" in pos and "beacon-1" in pos
        # permanent: survives expiry
        Map.shared().expire()
        assert "tower-1" in Map.shared().positions
        assert pos["tower-1"]["location"]["lat"] == 50.0

    def test_loader_registry_and_removal(self, env):
        state = {"markers": {
            "rx-1": MarkerLocation({"id": "rx-1", "mode": "Receivers",
                                    "lat": 40.0, "lon": -3.0})}}
        Markers.loaders["test"] = lambda: state["markers"]
        m = Markers.shared()
        m.refresh()
        assert "rx-1" in Map.shared().positions
        # loader drops the entry → removed from the map on next refresh
        state["markers"] = {}
        m.refresh()
        assert "rx-1" not in Map.shared().positions

    def test_ttl_markers_expire(self, env):
        Markers.loaders["eibi"] = lambda: {
            "tx-1": MarkerLocation({"id": "tx-1", "mode": "Stations",
                                    "lat": 0.0, "lon": 0.0, "ttl": -1})}
        Markers.shared().refresh()
        Map.shared().expire()
        assert "tx-1" not in Map.shared().positions

    def test_bad_file_tolerated(self, env):
        (env / "markers.json").write_text("{broken")
        Markers.shared().refresh()  # no exception
        assert Map.shared().positions == {}
