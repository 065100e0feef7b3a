"""Rig control: hamlib model catalogue + rigctl bridge behavior.

Reference: ``owrx/rigcontrol.py`` — RIGS table (settings dropdown), MODES
mapping, live enable/disable driven from property wiring.
"""

import subprocess

import pytest

from openwebrx_tpu.core.rigcontrol import (
    RIG_CATALOG, RIG_MODES, RigControl, rig_models,
)


def test_catalog_size_and_sorted():
    models = rig_models()
    # the reference table carries ~280 rigs; ours must be the same order
    # of magnitude so rigs are actually selectable by name
    assert len(models) > 250
    labels = [m["label"].lower() for m in models]
    assert labels == sorted(labels)
    # every entry has a positive hamlib id
    assert all(isinstance(m["id"], int) and m["id"] > 0 for m in models)


def test_catalog_well_known_ids():
    # spot-check hamlib's public rig ids (rigctl -l)
    flat = {f"{mk} {mo}": i for mk, ms in RIG_CATALOG.items() for i, mo in ms}
    assert flat["Hamlib NET rigctl"] == 2
    assert flat["Icom IC-7300"] == 3073
    assert flat["Kenwood TS-2000"] == 2014
    assert flat["Yaesu FT-991"] == 1035
    assert flat["Elecraft KX3"] == 2045


def test_mode_mapping():
    assert RIG_MODES["usb"] == "USB"
    assert RIG_MODES["cw"] == "CWR"          # receiver tunes the carrier
    assert RIG_MODES["usbd"] == "PKTUSB"
    assert "ft8" not in RIG_MODES            # digital modes ride usbd


def test_disabled_is_noop():
    rig = RigControl.__new__(RigControl)
    rig.proc = None
    rig.enabled = False
    rig._mod = None
    rig._freq = None
    import threading
    rig._plock = threading.Lock()
    assert rig.retune(14.2e6, 1500) is False
    assert rig.set_mode("usb") is False
    assert rig.set_ptt(True) is False


def test_retune_dedupes_and_formats(monkeypatch):
    sent = []

    rig = RigControl.__new__(RigControl)
    rig.enabled = True
    rig._mod = None
    rig._freq = None
    import threading
    rig._plock = threading.Lock()
    rig.proc = None
    monkeypatch.setattr(rig, "_command",
                        lambda cmd: sent.append(cmd) or True)
    assert rig.retune(14.0e6, 74000.0)
    assert rig.retune(14.0e6, 74000.0)       # dedupe: same dial freq
    rig.set_mode("lsb")
    rig.set_mode("lsb")                      # dedupe: same mode
    assert sent == ["F 14074000", "M LSB 0"]


def test_start_missing_rigctl_disables(monkeypatch):
    def boom(*a, **k):
        raise FileNotFoundError()
    monkeypatch.setattr(subprocess, "Popen", boom)
    rig = RigControl.__new__(RigControl)
    rig.proc = None
    rig.thread = None
    rig.enabled = False
    rig._mod = None
    rig._freq = None
    import threading
    rig._plock = threading.Lock()

    class FakeConfig(dict):
        pass

    rig._start(FakeConfig(rig_model=2, rig_device="127.0.0.1:4533"))
    assert rig.proc is None


def test_settings_form_has_rig_section():
    from openwebrx_tpu.web import forms
    schema = forms.schema()
    sections = {s["title"]: s for s in schema["general"]["sections"]}
    assert "Rig control" in sections
    rig_fields = {f["key"]: f for f in sections["Rig control"]["fields"]}
    assert rig_fields["rig_model"]["type"] == "dropdown"
    assert len(rig_fields["rig_model"]["options"]) > 250
