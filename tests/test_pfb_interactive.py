"""Interactive listeners ride the PFB channelizer (VERDICT r4 item 1).

``open_channel(service=False)`` must route through the per-bucket
'pfbi:' ChannelizedBank when the dial's passband fits a channel slice, so
N web listeners do NOT cost N full-rate filter chains (the reference's
scaling failure mode: one DspManager chain per client,
owrx/dsp.py:437-512).  Retunes that straddle a channel edge migrate LIVE
to a full-rate slot (audio keeps flowing, ADPCM resyncs via SYNC frames),
and a later retune back into a channel re-admits the listener to the
filterbank (with hysteresis).
"""

import time

import numpy as np

from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.runtime.device import DeviceRuntime
from openwebrx_tpu.sources.file import SignalSource
from tests.test_passband import decode_wire, tone_power_ratio

RATE = 3.072e6          # → 128 PFB channels of 24 kHz for SSB


def _make_runtime(signals, **kw):
    props = PropertyLayer(samp_rate=int(RATE), center_freq=14_100_000,
                          throttle=False, noise=2e-3, signals=signals)
    src = SignalSource("pfbi-test", props)
    rt = DeviceRuntime(src, capacity=8, target_seconds=0.05, **kw)
    return rt, src


def _pump(rt, src, blocks):
    """Drive the runtime synchronously for N device blocks."""
    src.start()
    for _ in range(blocks):
        b = src.read_block(timeout=5.0)
        assert b is not None
        rt._process_block(b)


class TestInteractivePfb:
    def test_listener_rides_pfb_with_adpcm_audio(self):
        """An interactive USB listener lands in the 'pfbi:' bank, its
        ADPCM wire audio decodes, and the tone comes through."""
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 1000.0,
              "amplitude": 0.4}])
        frames = []
        try:
            h = rt.open_channel("usb", 48_500.0)
            assert h.bucket_key == "pfbi:ssb"
            bank = rt.banks["pfbi:ssb"]
            assert bank.compression == "adpcm"
            assert bank.delivery_stride == 1
            h.audio_cb = lambda wire, hd=False: frames.append(wire)
            _pump(rt, src, 8)
        finally:
            src.stop()
        pcm = decode_wire(frames)
        assert len(pcm) >= 4000          # 8 × 50 ms blocks at 12 kHz
        assert tone_power_ratio(pcm[1200:], 1000.0) > -6.0

    def test_same_station_listeners_share_channel(self):
        """Two listeners on the SAME station both ride the filterbank
        (slot-gathered banks accept duplicate channel indices) — the
        many-users-one-frequency shape."""
        rt, src = _make_runtime([])
        try:
            a = rt.open_channel("usb", 48_500.0)
            b = rt.open_channel("usb", 48_500.0)
            c = rt.open_channel("usb", 48_700.0)   # same channel, other dial
            assert {a.bucket_key, b.bucket_key, c.bucket_key} == {"pfbi:ssb"}
            bank = rt.banks["pfbi:ssb"]
            ks = {int(bank._chan[h.slot]) for h in (a, b, c)}
            assert len(ks) == 1                      # one PFB channel…
            assert len({a.slot, b.slot, c.slot}) == 3  # …three slots
        finally:
            src.stop()

    def test_edge_dial_full_rate_and_nfm_gets_wider_slices(self):
        rt, src = _make_runtime([])
        try:
            # 11.8 kHz straddles the 24 kHz channel-0/1 boundary → full rate
            edge = rt.open_channel("usb", 11_800.0)
            assert edge.bucket_key == "ssb"
            # NFM cannot run at 24 kHz channel rate (48 kHz IF) — it gets
            # its own 64-channel / 48 kHz-slice bank
            nfm = rt.open_channel("nfm", -192_000.0 + 2_000.0)
            assert nfm.bucket_key == "pfbi:nfm"
            assert rt.banks["pfbi:nfm"].m == 64
        finally:
            src.stop()

    def test_migration_and_readmit_with_audio_continuity(self):
        """Drag across a channel edge mid-stream: PFB → full-rate → PFB,
        with decodable audio flowing in every phase (the live-migration
        requirement; reference keeps one full-rate chain per client so it
        never faces this, owrx/dsp.py:437-512)."""
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 1000.0,
              "amplitude": 0.4},
             {"kind": "usb", "offset_hz": 11_800.0, "f_audio": 1500.0,
              "amplitude": 0.4}])
        phases = {"pfb": [], "full": [], "back": []}
        current = ["pfb"]
        try:
            h = rt.open_channel("usb", 48_500.0)
            assert h.bucket_key == "pfbi:ssb"
            h.audio_cb = lambda wire, hd=False: phases[current[0]].append(wire)
            _pump(rt, src, 6)

            # drag onto the edge: migrates to the full-rate listener bank
            h.set_offset(11_800.0)
            assert h.bucket_key == "ssb"
            assert h.slot is not None
            current[0] = "full"
            for _ in range(6):
                b = src.read_block(timeout=5.0)
                rt._process_block(b)

            # drag back to a centered dial: re-admitted to the filterbank
            h.set_offset(48_500.0)
            assert h.bucket_key == "pfbi:ssb"
            current[0] = "back"
            for _ in range(6):
                b = src.read_block(timeout=5.0)
                rt._process_block(b)
        finally:
            src.stop()
        # audio flowed and decodes in every phase; each migration resets
        # the framer so the first frame re-syncs the codec
        pcm_pfb = decode_wire(phases["pfb"])
        pcm_full = decode_wire(phases["full"])
        pcm_back = decode_wire(phases["back"])
        assert len(pcm_pfb) >= 3000 and len(pcm_full) >= 3000 \
            and len(pcm_back) >= 3000     # 6 × 50 ms blocks at 12 kHz
        assert tone_power_ratio(pcm_pfb[1200:], 1000.0) > -6.0
        assert tone_power_ratio(pcm_full[1200:], 1500.0) > -6.0
        assert tone_power_ratio(pcm_back[1200:], 1000.0) > -6.0
        # the migrations actually happened through distinct banks
        assert "ssb" in rt.banks and "pfbi:ssb" in rt.banks

    def test_smeter_on_pfb_path(self):
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 800.0,
              "amplitude": 0.5}])
        vals = []
        try:
            h = rt.open_channel("usb", 48_500.0)
            assert h.bucket_key == "pfbi:ssb"
            h.smeter_cb = vals.append
            _pump(rt, src, 8)
        finally:
            src.stop()
        assert len(vals) >= 2
        assert all(np.isfinite(v) for v in vals)

    def test_mode_switch_stays_channelized(self):
        """usb → lsb on a PFB listener re-routes through open_channel and
        stays in the filterbank when the new passband fits."""
        rt, src = _make_runtime([])
        try:
            h = rt.open_channel("usb", 48_500.0)
            assert h.bucket_key == "pfbi:ssb"
            h.set_mode("lsb")
            assert h.bucket_key == "pfbi:ssb"
            assert h.mode == "lsb"
            assert h.slot is not None
            bank = rt.banks["pfbi:ssb"]
            assert float(bank._low[h.slot]) == -3000.0
        finally:
            src.stop()


class TestCrossProgramJoin:
    """The per-block cross-program join (round 5): waterfall + banks fuse
    into ONE device→host transfer; bank membership may change between
    dispatch and complete."""

    def test_waterfall_and_banks_share_one_transfer(self):
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 1000.0,
              "amplitude": 0.4}])
        rows, frames = [], []
        rt.subscribe_waterfall(lambda p: rows.append(len(p)))
        h = rt.open_channel("usb", 48_500.0)
        h.audio_cb = lambda wire, hd=False: frames.append(wire)
        try:
            src.start()
            b = src.read_block(timeout=5.0)
            pend = rt._dispatch_block(b)
            # two programs (fft + pfbi bank) joined into one buffer
            assert pend["joined"] is not None
            assert len(pend["segs"]) == 2
            keys = [s[0] for s in pend["segs"]]
            assert "fft" in keys and "pfbi:ssb" in keys
            rt._complete_block(pend)
            assert rows and frames
        finally:
            src.stop()
        pcm = decode_wire(frames)
        assert len(pcm) > 0

    def test_single_program_skips_join(self):
        rt, src = _make_runtime([])
        h = rt.open_channel("usb", 48_500.0)
        h.audio_cb = lambda wire, hd=False: None
        try:
            src.start()
            pend = rt._dispatch_block(src.read_block(timeout=5.0))
            assert pend["joined"] is None          # one program: no concat
            rt._complete_block(pend)
        finally:
            src.stop()

    def test_bank_added_between_dispatch_and_complete(self):
        """A listener opening mid-block must not corrupt the in-flight
        completion (snapshot semantics)."""
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 900.0,
              "amplitude": 0.4}])
        got = {"a": 0, "b": 0}
        a = rt.open_channel("usb", 48_500.0)
        a.audio_cb = lambda w, hd=False: got.__setitem__("a", got["a"] + 1)
        try:
            src.start()
            pend = rt._dispatch_block(src.read_block(timeout=5.0))
            # new AM bank appears while the block is in flight
            b = rt.open_channel("am", -96_000.0)
            b.audio_cb = lambda w, hd=False: got.__setitem__("b", got["b"] + 1)
            rt._complete_block(pend)               # old snapshot: only a
            assert got["a"] == 1 and got["b"] == 0
            rt._process_block(src.read_block(timeout=5.0))
            assert got["a"] == 2 and got["b"] == 1
        finally:
            src.stop()

    def test_uint8_wire_block_through_runtime(self):
        """A packed (n,2) uint8 device block (rtl-sdr wire) decodes the
        same tone as the float path (round 5)."""
        rt, src = _make_runtime(
            [{"kind": "usb", "offset_hz": 48_500.0, "f_audio": 1000.0,
              "amplitude": 0.4}])
        frames = []
        h = rt.open_channel("usb", 48_500.0)
        h.audio_cb = lambda wire, hd=False: frames.append(wire)
        try:
            src.start()
            for _ in range(6):
                blk = src.read_block(timeout=5.0)      # complex64
                packed = np.stack([blk.real, blk.imag], axis=-1)
                u8 = np.clip(packed * 128.0 + 127.4, 0, 255).astype(np.uint8)
                rt._process_block(u8)
        finally:
            src.stop()
        pcm = decode_wire(frames)
        assert len(pcm) >= 3000
        assert tone_power_ratio(pcm[1200:], 1000.0) > -6.0
