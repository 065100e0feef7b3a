"""PFB channelizer in the SERVING path (VERDICT r3 item 1).

Background service channels must come from one polyphase-filterbank
program per mode bucket (``DeviceRuntime._get_pfb_bank``), not from
full-rate ChannelBank slots — the TPU replacement for the reference's
greedy resampler-grouping optimizer (owrx/service/__init__.py:199-252).
"""

import time

import numpy as np
import pytest

from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.runtime.device import DeviceRuntime
from openwebrx_tpu.sources.file import SignalSource


RATE = 3.072e6          # → 128 PFB channels of 24 kHz


def _make_runtime(signals, **kw):
    props = PropertyLayer(samp_rate=int(RATE), center_freq=14_100_000,
                          throttle=False, noise=1e-4, signals=signals)
    src = SignalSource("pfb-test", props)
    rt = DeviceRuntime(src, capacity=8, target_seconds=0.05, **kw)
    return rt, src


class TestPfbServing:
    def test_64_dials_one_program(self):
        """64 background USB dials (the FT8/WSPR service shape) all serve
        from ONE ChannelizedBank program; audio flows on every one, and a
        test tone decodes in its owner's channel only."""
        m = 128
        centers = np.fft.fftfreq(m, 1 / RATE)  # channel k center = k·fs/m
        # 64 dials on distinct channel centers (+500 Hz fine offset so the
        # fine shift does real work), skipping DC and the band edges
        ks = [k for k in range(2, m // 2 - 2)] + \
             [k for k in range(m // 2 + 2, m - 2)]
        ks = ks[:64]
        dials = [float(centers[k] + 500.0) for k in ks]
        tone_dial = dials[10]
        # noise at −54 dBFS: the PFB prototype's stopband (~−55 dB) puts
        # any cross-channel tone leakage BELOW the per-channel noise floor,
        # as in a real receiver (an unrealistically quiet floor would
        # expose the finite stopband as a fake "leak")
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": tone_dial, "f_audio": 1000.0,
              "amplitude": 0.4}], )
        rt.source.props["noise"] = 2e-3
        audio: dict[int, list] = {i: [] for i in range(len(dials))}
        handles = []
        try:
            for i, dial in enumerate(dials):
                h = rt.open_channel("usb", dial, service=True)
                h.audio_cb = (lambda wire, hd=False, i=i:
                              audio[i].append(wire))
                handles.append(h)
            # every dial landed in the SAME pfb bank (one program)
            assert {h.bucket_key for h in handles} == {"pfb:ssb"}
            bank = rt.banks["pfb:ssb"]
            assert bank.n_active == 64
            assert bank.m == m
            assert "svc:ssb" not in rt.banks
            rt.start()
            deadline = time.time() + 30
            while time.time() < deadline:
                if all(audio[i] for i in audio) and \
                        sum(len(b) for b in audio[10]) > 24000:
                    break
                time.sleep(0.1)
        finally:
            rt.stop()
            src.stop()
        assert all(audio[i] for i in audio), "audio missing on some dials"
        # the tone channel hears 1 kHz…
        pcm = np.frombuffer(b"".join(audio[10]), np.int16).astype(np.float32)
        spec = np.abs(np.fft.rfft(pcm[1200:]))
        freqs = np.fft.rfftfreq(len(pcm) - 1200, 1 / 12000.0)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - 1000.0) < 30.0, f"tone at {peak} Hz"
        # …and a far-away channel is isolated: its residual 1 kHz line
        # (the prototype's ~−55 dB stopband; a coherent leak always pokes
        # above PER-BIN noise) must sit ≥ 30 dB below the owner channel's
        # tone, measured as tone-band-to-median-bin ratio in each channel
        tone_ratio = spec[(freqs > 950) & (freqs < 1050)].max() / \
            np.median(spec[3:])
        other = np.frombuffer(b"".join(audio[40]), np.int16).astype(np.float32)
        spec_o = np.abs(np.fft.rfft(other[1200:]))
        freqs_o = np.fft.rfftfreq(len(other) - 1200, 1 / 12000.0)
        other_ratio = spec_o[(freqs_o > 950) & (freqs_o < 1050)].max() / \
            np.median(spec_o[3:])
        assert tone_ratio > 31.6 * other_ratio, \
            f"PFB channel isolation too low: {tone_ratio:.1f} vs {other_ratio:.1f}"

    def test_edge_dial_falls_back_to_full_rate(self):
        """A dial whose passband straddles a PFB channel edge cannot serve
        from the critically-sampled filterbank — it takes a full-rate
        'svc:' slot instead."""
        rt, src = _make_runtime([])
        try:
            # channel width is RATE/128 = 24 kHz; +11.8 kHz sits on the
            # boundary between channels 0 and 1 → usb passband (0..3 kHz)
            # cannot fit either slice
            edge = rt.open_channel("usb", 11_800.0, service=True)
            assert edge.bucket_key == "svc:ssb"
            # a centered dial still prefers the PFB
            mid = rt.open_channel("usb", 48_000.0 + 500.0, service=True)
            assert mid.bucket_key == "pfb:ssb"
            # second dial in the SAME channel SHARES it (slot-gathered
            # banks take duplicate gather indices — round 5): both serve
            # from the filterbank with independent fine shifts
            dup = rt.open_channel("usb", 48_000.0 + 900.0, service=True)
            assert dup.bucket_key == "pfb:ssb"
            bank = rt.banks["pfb:ssb"]
            assert int(bank._chan[mid.slot]) == int(bank._chan[dup.slot])
            assert mid.slot != dup.slot
        finally:
            src.stop()

    def test_pfb_retune_and_release(self):
        rt, src = _make_runtime([])
        try:
            h = rt.open_channel("usb", 48_500.0, service=True)
            assert h.bucket_key == "pfb:ssb"
            bank = rt.banks["pfb:ssb"]
            s0 = h.slot
            assert int(bank._chan[s0]) == 2       # 48.5 kHz → channel 2
            # retune within the same channel keeps slot and channel
            h.set_offset(48_900.0)
            assert h.slot == s0 and int(bank._chan[s0]) == 2
            # retune into another channel keeps the slot, remaps the channel
            h.set_offset(72_500.0)
            assert h.slot == s0 and int(bank._chan[s0]) == 3
            h.close()
            assert bank.n_active == 0
        finally:
            src.stop()


class TestMixedLoad:
    def test_listener_services_waterfall_share_device(self):
        """An interactive listener (full-rate bank), a waterfall
        subscriber and a PFB service bank all run on one DeviceRuntime
        block loop — audio flows on all of them concurrently."""
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 900.0,
              "amplitude": 0.4},
             {"kind": "nfm", "offset_hz": -200_000.0, "f_audio": 700.0,
              "amplitude": 0.4}])
        rows = []
        got = {"listener": 0, "svc": 0}
        rt.subscribe_waterfall(lambda payload: rows.append(len(payload)))
        listener = rt.open_channel("nfm", -200_000.0)
        listener.audio_cb = (lambda w, hd=False:
                             got.__setitem__("listener", got["listener"] + 1))
        svc = rt.open_channel("usb", 48_500.0, service=True)
        svc.audio_cb = (lambda w, hd=False:
                        got.__setitem__("svc", got["svc"] + 1))
        assert svc.bucket_key == "pfb:ssb"
        # interactive listeners ride the filterbank too now (round 5);
        # NFM gets its own 48 kHz-slice bank (its IF needs ≥48 kHz)
        assert listener.bucket_key == "pfbi:nfm"
        try:
            rt.start()
            deadline = time.time() + 25
            while time.time() < deadline:
                if got["listener"] >= 3 and got["svc"] >= 3 and len(rows) >= 3:
                    break
                time.sleep(0.1)
        finally:
            rt.stop()
            src.stop()
        assert got["listener"] >= 3, got
        assert got["svc"] >= 3, got
        assert len(rows) >= 3

    def test_service_retune_migrates_on_edge(self):
        """Retuning a PFB service onto a channel edge migrates it to a
        full-rate slot with audio still flowing (review finding r4)."""
        rt, src = _make_runtime([])
        try:
            h = rt.open_channel("usb", 48_500.0, service=True)
            assert h.bucket_key == "pfb:ssb"
            # 11.8 kHz sits on the channel-0/1 boundary: cannot fit
            h.set_offset(11_800.0)
            assert h.bucket_key == "svc:ssb"
            assert h.slot is not None
            # and a second service can now take the vacated PFB channel
            h2 = rt.open_channel("usb", 48_600.0, service=True)
            assert h2.bucket_key == "pfb:ssb"
        finally:
            src.stop()
