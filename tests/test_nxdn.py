"""Native NXDN link layer (round 5): LICH complement coding, SACCH
punctured-conv FEC + CRC-6, VCALL superframe reassembly — round-trip
validated (digimodes/nxdn.py docstring; reference needs nxdn_decoder,
csdr/chain/digiham.py:101-120)."""

import numpy as np

from openwebrx_tpu.digimodes import nxdn

rng = np.random.default_rng(31)


class TestCodes:
    def test_lich_roundtrip_and_violation(self):
        for v in (0x00, 0xFF, 0x5A, 0x83):
            assert nxdn.lich_decode(nxdn.lich_encode(v)) == v
        # 1-2 violated pairs are tolerated (first bit kept); 3+ reject
        ok1 = nxdn.lich_encode(0x5A)
        ok1[1] ^= 1
        assert nxdn.lich_decode(ok1) == 0x5A
        bad = nxdn.lich_encode(0x5A)
        for i in (1, 3, 5):
            bad[i] ^= 1
        assert nxdn.lich_decode(bad) is None

    def test_sacch_roundtrip_with_errors(self):
        tx = nxdn.sacch_encode(2, 0x2ABCD & 0x3FFFF)
        assert len(tx) == 60
        got = nxdn.sacch_decode(tx)
        assert got == (2, 0x2ABCD & 0x3FFFF)
        e = tx.copy()
        for p in rng.choice(60, 3, replace=False):
            e[p] ^= 1
        got = nxdn.sacch_decode(e)
        assert got == (2, 0x2ABCD & 0x3FFFF)

    def test_sacch_crc_rejects_garbage(self):
        assert nxdn.sacch_decode(
            rng.integers(0, 2, 60).astype(np.uint8)) is None


class TestStream:
    def test_vcall_ids_across_superframe(self):
        segs = nxdn.vcall_segments(src=1234, dst=5678)
        frames = [nxdn.build_frame(0x40, st, pl) for st, pl in segs]
        stream = np.concatenate(
            [rng.integers(0, 4, 83).astype(np.uint8)] + frames +
            [rng.integers(0, 4, 40).astype(np.uint8)])
        dec = nxdn.NxdnDecoder()
        events = []
        for i in range(0, len(stream), 157):
            events += dec.feed(stream[i:i + 157])
        calls = [e for e in events if e.get("type") == "vcall"]
        assert calls, f"no VCALL: {events}"
        assert calls[0]["source"] == 1234
        assert calls[0]["target"] == 5678

    def test_tx_release_ends_call(self):
        blob = nxdn.MSG_TX_REL << 64
        segs = [(3 - i, (blob >> (72 - 18 * (i + 1))) & 0x3FFFF)
                for i in range(4)]
        frames = [nxdn.build_frame(0x40, st, pl) for st, pl in segs]
        dec = nxdn.NxdnDecoder()
        events = dec.feed(np.concatenate(frames))
        assert any(e.get("end") for e in events)

    def test_native_nxdn_from_c4fm_iq(self):
        """4FSK IQ at 2400 baud → TPU symbol chain → native NXDN layer →
        unit IDs, through DigitalVoiceHandle (no binary)."""
        import sys
        import threading
        import types
        sys.path.insert(0, "tests")
        from test_digital_voice import FS, c4fm_waveform
        from openwebrx_tpu.runtime.device import DigitalVoiceHandle

        segs = nxdn.vcall_segments(src=42, dst=777)
        frames = []
        for st, pl in segs:
            f = nxdn.build_frame(0x40, st, pl)
            # random voice payload: a constant zeroed field starves the
            # adaptive 4FSK slicer of the outer levels
            f[48:] = rng.integers(0, 4, len(f) - 48)
            frames.append(f)
        idle = rng.integers(0, 4, 120).astype(np.uint8)
        stream = np.concatenate([idle] + frames + frames + [idle])
        x = c4fm_waveform(stream, baud=2400.0, dev_hz=350.0,
                          rrc_alpha=0.2)
        runtime = types.SimpleNamespace(in_rate=FS, _lock=threading.RLock(),
                                        secondary_handles=[])
        handle = DigitalVoiceHandle(runtime, "nxdn", 0.0,
                                    command_override=["cat"])
        metas = []
        handle.meta_cb = metas.append
        try:
            n = len(x) // handle.block
            for blk in np.split(x[: n * handle.block], n):
                handle.feed(blk)
        finally:
            handle.pipeline.close()
        calls = [m for m in metas if m.get("type") == "vcall"]
        assert calls, f"no VCALL decoded: {metas}"
        assert calls[0]["source"] == 42 and calls[0]["target"] == 777


class TestSuperframeIsolation:
    def test_no_chimeric_ids_across_calls(self):
        """Round-5 review regression: stale fragments of a partially-lost
        call must not merge with the next call's segments."""
        segs_a = nxdn.vcall_segments(src=0x1111, dst=0x2222)
        segs_b = nxdn.vcall_segments(src=0x3333, dst=0x4444)
        frames = [nxdn.build_frame(0x40, *segs_a[0]),   # A: only 3,2
                  nxdn.build_frame(0x40, *segs_a[1])] + \
                 [nxdn.build_frame(0x40, st, pl) for st, pl in segs_b]
        dec = nxdn.NxdnDecoder()
        events = dec.feed(np.concatenate(
            [rng.integers(0, 4, 60).astype(np.uint8)] + frames))
        calls = [e for e in events if e.get("type") == "vcall"]
        assert calls, events
        assert all(c["source"] == 0x3333 and c["target"] == 0x4444
                   for c in calls), f"chimeric IDs: {calls}"
