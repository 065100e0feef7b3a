"""Batched secondary digimodes (VERDICT r4 item 8): N same-mode
digimode listeners share ONE SecondaryBank Program — per-listener
offset/carrier are parameter array rows, not separate compiled chains
(reference: one secondary demodulator per client, owrx/dsp.py:682-797).
"""

import types

import numpy as np

from openwebrx_tpu.digimodes import psk as pskmod
from openwebrx_tpu.runtime.device import SecondaryBank, SecondaryHandle

FS = 48000.0


def varicode_encode(text: str) -> list[int]:
    bits = []
    for ch in text:
        bits.extend(int(b) for b in pskmod._VARICODE[ord(ch)])
        bits.extend([0, 0])
    return bits


def psk31_iq(text: str, f0: float, amplitude: float = 0.4) -> np.ndarray:
    baud = 31.25
    bits = [0] * 24 + varicode_encode(text) + [0] * 16
    phases = [1.0]
    for b in bits:
        phases.append(phases[-1] * (1.0 if b else -1.0))
    sym = np.repeat(phases, int(FS / baud))
    n = np.arange(len(sym))
    return (amplitude * sym * np.exp(2j * np.pi * f0 / FS * n)) \
        .astype(np.complex64)


class TestSecondaryBank:
    def test_two_listeners_one_program(self):
        """Two BPSK31 cursors at different dials decode their own text
        through ONE shared Program; output identical to what each would
        decode alone."""
        runtime = types.SimpleNamespace(in_rate=FS)
        bank = SecondaryBank(runtime, "bpsk31", capacity=2)
        a = SecondaryHandle(runtime, "bpsk31", 1200.0, bank)
        b = SecondaryHandle(runtime, "bpsk31", 3000.0, bank)
        assert a.bank is b.bank
        assert a.bank.program is b.bank.program      # ONE jitted program
        assert a.slot != b.slot
        got = {"a": [], "b": []}
        a.text_cb = got["a"].append
        b.text_cb = got["b"].append

        xa = psk31_iq("cq de alpha", 1200.0)
        xb = psk31_iq("cq de bravo", 3000.0)
        n = max(len(xa), len(xb))
        x = np.zeros(n, np.complex64)
        x[:len(xa)] += xa
        x[:len(xb)] += xb
        step = 1 << 14
        for i in range(0, n, step):
            bank.feed(x[i:i + step])
        ta, tb = "".join(got["a"]), "".join(got["b"])
        assert "cq de alpha" in ta, f"a decoded: {ta!r}"
        assert "cq de bravo" in tb, f"b decoded: {tb!r}"
        # and no cross-talk: each heard only its own signal
        assert "bravo" not in ta and "alpha" not in tb

    def test_grow_recompiles_and_keeps_members(self):
        runtime = types.SimpleNamespace(in_rate=FS)
        bank = SecondaryBank(runtime, "bpsk31", capacity=1)
        a = SecondaryHandle(runtime, "bpsk31", 1000.0, bank)
        prog1 = bank.program
        b = SecondaryHandle(runtime, "bpsk31", 2000.0, bank)   # forces grow
        assert bank.capacity == 2
        assert bank.program is not prog1
        assert bank.members[a.slot] is a and bank.members[b.slot] is b
        # detach both → bank empties (runtime drop hook absent → no-op)
        bank.detach(a)
        bank.detach(b)
        assert bank._active.sum() == 0

    def test_runtime_shares_bank_across_open_secondary(self):
        """DeviceRuntime.open_secondary folds same-mode handles into one
        bank and removes it when the last one closes."""
        from openwebrx_tpu.core.property import PropertyLayer
        from openwebrx_tpu.runtime.device import DeviceRuntime
        from openwebrx_tpu.sources.file import SignalSource
        props = PropertyLayer(samp_rate=240000, center_freq=14_100_000,
                              throttle=False, noise=1e-4, signals=[])
        src = SignalSource("secbank", props)
        rt = DeviceRuntime(src, capacity=4, target_seconds=0.05)
        try:
            h1 = rt.open_secondary("bpsk31", 1000.0)
            h2 = rt.open_secondary("bpsk31", 2000.0)
            h3 = rt.open_secondary("rtty170", 1500.0)
            assert h1.bank is h2.bank
            assert h3.bank is not h1.bank
            assert set(rt.secondary_banks) == {"bpsk31", "rtty170"}
            # feed path registers each bank once
            assert rt.secondary_handles.count(h1.bank) == 1
            rt.release_secondary(h1)
            assert "bpsk31" in rt.secondary_banks     # h2 still attached
            rt.release_secondary(h2)
            assert "bpsk31" not in rt.secondary_banks
            assert h1.bank not in rt.secondary_handles
        finally:
            src.stop()
