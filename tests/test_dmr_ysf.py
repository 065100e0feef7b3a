"""Native DMR/YSF frame layer (VERDICT r4 item 4): dibit streams decode
to talker metadata with zero external binaries.

Every FEC layer is validated encode→corrupt→decode (no off-air captures
exist in this image; see digimodes/fec.py docstring), and golden dibit
fixtures built with the encoders decode to known talkgroup/callsign
through the streaming decoders — the exact surface DigitalVoiceHandle
feeds (reference analog: digiham dmr_decoder/ysf_decoder wiring,
csdr/chain/digiham.py:15-76).
"""

import numpy as np
import pytest

from openwebrx_tpu.digimodes import dmr, fec, ysf


rng = np.random.default_rng(42)


class TestFec:
    def test_hamming_15_11_roundtrip_and_correction(self):
        for _ in range(50):
            d = rng.integers(0, 2, 11).astype(np.uint8)
            w = fec.hamming_15_11_encode(d)
            got, ok = fec.hamming_15_11_decode(w)
            assert ok and np.array_equal(got, d)
            e = w.copy()
            e[rng.integers(0, 15)] ^= 1
            got, ok = fec.hamming_15_11_decode(e)
            assert ok and np.array_equal(got, d)

    def test_hamming_13_9_roundtrip_and_correction(self):
        for _ in range(50):
            d = rng.integers(0, 2, 9).astype(np.uint8)
            w = fec.hamming_13_9_encode(d)
            e = w.copy()
            e[rng.integers(0, 13)] ^= 1
            got, ok = fec.hamming_13_9_decode(e)
            assert ok and np.array_equal(got, d)

    def test_golay_24_12_corrects_3_errors(self):
        for data in (0x000, 0xFFF, 0xA5A, 0x123):
            w = fec.golay_24_12_encode(data)
            for nerr in (0, 1, 2, 3):
                e = w.copy()
                for p in rng.choice(24, nerr, replace=False):
                    e[p] ^= 1
                got, dist = fec.golay_24_12_decode(e)
                assert got == data and dist == nerr

    def test_golay_20_8_corrects_3_errors(self):
        for data in (0x00, 0xFF, 0x5A, 0x17):
            w = fec.golay_20_8_encode(data)
            assert len(w) == 20
            e = w.copy()
            for p in rng.choice(20, 3, replace=False):
                e[p] ^= 1
            got, dist = fec.golay_20_8_decode(e)
            assert got == data and dist == 3

    def test_viterbi_roundtrip_with_errors(self):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        bits[-4:] = 0                       # flush
        sym = fec.conv_encode(bits)
        # flip 4 scattered symbol bits
        e = sym.copy()
        for p in rng.choice(len(sym), 4, replace=False):
            e[p, rng.integers(0, 2)] ^= 1
        got = fec.viterbi_decode(e, 96)
        assert np.array_equal(got, bits[:96])

    def test_rs_12_9(self):
        data = rng.integers(0, 256, 9).astype(np.uint8)
        par = fec.rs_12_9_parity(data)
        word = np.concatenate([data, par])
        assert fec.rs_12_9_check(word)
        bad = word.copy()
        bad[4] ^= 0x40
        assert not fec.rs_12_9_check(bad)


class TestBptc:
    def test_roundtrip_and_single_errors(self):
        info = rng.integers(0, 2, 96).astype(np.uint8)
        tx = dmr.bptc_encode(info)
        assert len(tx) == 196
        got, ok = dmr.bptc_decode(tx)
        assert ok and np.array_equal(got, info)
        # scattered channel errors heal through the row/column grid
        e = tx.copy()
        for p in (3, 77, 150):
            e[p] ^= 1
        got, ok = dmr.bptc_decode(e)
        assert np.array_equal(got, info)


class TestDmrDecoder:
    def test_voice_lc_header_decodes_talkgroup(self):
        """Golden fixture: BS data burst carrying a voice LC header for
        talkgroup 91, source 2345678 → metadata event."""
        info = dmr.encode_lc(flco=0, fid=0, opts=0, dest=91, src=2345678,
                             data_type="voice_lc_header")
        burst = dmr.build_burst("voice_lc_header", info, color_code=7)
        noise = rng.integers(0, 4, 300).astype(np.uint8)
        stream = np.concatenate([noise, burst,
                                 rng.integers(0, 4, 200).astype(np.uint8)])
        dec = dmr.DmrDecoder()
        events = []
        # feed in uneven chunks like the runtime does
        for i in range(0, len(stream), 97):
            events += dec.feed(stream[i:i + 97])
        lcs = [e for e in events if "target" in e]
        assert lcs, f"no LC decoded: {events}"
        lc = lcs[0]
        assert lc["protocol"] == "DMR"
        assert lc["target"] == 91
        assert lc["source"] == 2345678
        assert lc["type"] == "group"
        assert lc["color_code"] == 7

    def test_terminator_ends_call(self):
        info = dmr.encode_lc(flco=3, fid=0, opts=0, dest=1234567,
                             src=7654321, data_type="terminator_with_lc")
        burst = dmr.build_burst("terminator_with_lc", info)
        dec = dmr.DmrDecoder()
        events = dec.feed(np.concatenate(
            [rng.integers(0, 4, 120).astype(np.uint8), burst]))
        lcs = [e for e in events if "target" in e]
        assert lcs and lcs[0]["end"] and lcs[0]["type"] == "direct"
        assert lcs[0]["target"] == 1234567 and lcs[0]["source"] == 7654321

    def test_burst_survives_symbol_errors(self):
        info = dmr.encode_lc(flco=0, fid=0, opts=0, dest=9, src=424242,
                             data_type="voice_lc_header")
        burst = dmr.build_burst("voice_lc_header", info)
        # corrupt 3 payload dibits (not the sync, not the slot type:
        # dibits 0..48 are payload-only)
        bad = burst.copy()
        for p in (5, 20, 40):
            bad[p] ^= 1
        events = dmr.DmrDecoder().feed(np.concatenate(
            [np.zeros(80, np.uint8), bad]))
        lcs = [e for e in events if "target" in e]
        assert lcs and lcs[0]["target"] == 9 and lcs[0]["source"] == 424242


class TestYsf:
    def test_fich_roundtrip(self):
        tx = ysf.fich_encode(fi=1, cs=2, cm=0, bn=1, bt=2, fn=3, ft=6,
                             dt=2, sql=1, sq=42)
        assert len(tx) == 100
        got = ysf.fich_decode(tx)
        assert got == {"fi": 1, "cs": 2, "cm": 0, "bn": 1, "bt": 2,
                       "fn": 3, "ft": 6, "dt": 2, "sql": 1, "sq": 42}

    def test_fich_survives_symbol_errors(self):
        tx = ysf.fich_encode(fi=0, cs=0, cm=0, bn=0, bt=0, fn=0, ft=7,
                             dt=2)
        e = tx.copy()
        for p in rng.choice(100, 3, replace=False):
            e[p] ^= rng.integers(1, 4)
        got = ysf.fich_decode(e)
        assert got is not None and got["ft"] == 7 and got["dt"] == 2

    def test_dch_roundtrip(self):
        tx = ysf.dch_encode(b"W1AW      ")
        assert ysf.dch_decode(tx) == b"W1AW      "
        # corrupted CRC → None (no garbage callsigns)
        e = tx.copy()
        e[:20] = (e[:20] + 1) % 4
        assert ysf.dch_decode(e) is None

    def test_stream_decodes_callsigns(self):
        """Golden fixture: three frames (source FN=1, dest FN=2,
        terminator) through the streaming decoder."""
        f_src = ysf.build_frame(
            dict(fi=1, cs=0, cm=0, bn=0, bt=0, fn=1, ft=6, dt=2),
            b"KD8XYZ    ")
        f_dst = ysf.build_frame(
            dict(fi=1, cs=0, cm=0, bn=0, bt=0, fn=2, ft=6, dt=2),
            b"ALL       ")
        f_end = ysf.build_frame(
            dict(fi=2, cs=0, cm=0, bn=0, bt=0, fn=0, ft=6, dt=2), None)
        stream = np.concatenate([
            rng.integers(0, 4, 137).astype(np.uint8),
            f_src, f_dst, f_end,
            rng.integers(0, 4, 60).astype(np.uint8)])
        dec = ysf.YsfDecoder()
        events = []
        for i in range(0, len(stream), 211):
            events += dec.feed(stream[i:i + 211])
        srcs = [e for e in events if e.get("source")]
        assert srcs, f"no callsign: {events}"
        assert srcs[0]["source"] == "KD8XYZ"
        assert srcs[0]["mode"] == "vd_mode2"
        both = [e for e in events if e.get("target")]
        assert both and both[0]["target"] == "ALL"
        ends = [e for e in events if e.get("end")]
        assert ends, "terminator not seen"


class TestEndToEnd:
    def test_native_dmr_metadata_from_c4fm_iq(self):
        """Full path: C4FM IQ → TPU symbol chain → native DMR frame layer
        → talkgroup metadata, no external binary (VERDICT r4 item 4 done
        criterion).  The vocoder pipeline is stubbed with `cat`."""
        import sys
        import threading
        import types
        sys.path.insert(0, "tests")
        from test_digital_voice import FS, c4fm_waveform
        from openwebrx_tpu.runtime.device import DigitalVoiceHandle

        info = dmr.encode_lc(flco=0, fid=0, opts=0, dest=91, src=3100123,
                             data_type="voice_lc_header")
        burst = dmr.build_burst("voice_lc_header", info, color_code=1)
        idle = rng.integers(0, 4, 200).astype(np.uint8)
        stream = np.concatenate([idle, burst, burst, burst, burst, idle])
        x = c4fm_waveform(stream, baud=4800.0, dev_hz=648.0)

        runtime = types.SimpleNamespace(in_rate=FS, _lock=threading.RLock(),
                                        secondary_handles=[])
        handle = DigitalVoiceHandle(runtime, "dmr", 0.0,
                                    command_override=["cat"])
        metas = []
        handle.meta_cb = metas.append
        try:
            n = len(x) // handle.block
            for blk in np.split(x[: n * handle.block], n):
                handle.feed(blk)
        finally:
            handle.pipeline.close()
        lcs = [m for m in metas if m.get("target")]
        assert lcs, f"no native LC metadata: {metas}"
        assert lcs[0]["target"] == 91
        assert lcs[0]["source"] == 3100123


class TestSyncOrdering:
    def test_data_burst_before_voice_burst_in_one_chunk(self):
        """Round-5 review regression: a voice-sync later in the chunk must
        not shadow an earlier data burst — earliest sync BY POSITION wins
        across patterns, or voice LC headers get dropped in normal
        interleaved streams."""
        info = dmr.encode_lc(flco=0, fid=0, opts=0, dest=77, src=1111111,
                             data_type="voice_lc_header")
        data_burst = dmr.build_burst("voice_lc_header", info)
        # a fake voice burst: BS voice sync surrounded by noise payload
        voice_sync = dmr._SYNC_DIBITS[0x755FD7DF75F7]
        nb = rng.integers(0, 4, 54).astype(np.uint8)
        voice_burst = np.concatenate([nb, voice_sync, nb])
        stream = np.concatenate([np.zeros(60, np.uint8), data_burst,
                                 voice_burst, np.zeros(30, np.uint8)])
        events = dmr.DmrDecoder().feed(stream)     # ONE chunk
        lcs = [e for e in events if e.get("target") == 77]
        assert lcs, f"data burst shadowed by later voice sync: {events}"
        assert lcs[0]["frame_type"] == "voice_lc_header"


class TestEmbeddedLc:
    def test_embedded_roundtrip_with_errors(self):
        info = dmr.lc_info_bits(0, 0, 0, dest=91, src=3100123)
        frags = dmr.embedded_lc_encode(info)
        assert len(frags) == 128
        e = frags.copy()
        for p in (5, 40, 77, 120):           # one error per fragment row
            e[p] ^= 1
        lc = dmr.embedded_lc_decode(e)
        assert lc and lc["target"] == 91 and lc["source"] == 3100123
        assert lc["via"] == "embedded"

    def test_checksum_rejects_garbage(self):
        assert dmr.embedded_lc_decode(
            rng.integers(0, 2, 128).astype(np.uint8)) is None

    def test_mid_call_join_decodes_talker(self):
        """Join MID-CALL (no voice LC header seen): the embedded LC in
        bursts B-E still identifies the talker — the VERDICT r4 item-4
        'embedded LC' requirement."""
        info = dmr.lc_info_bits(0, 0, 0, dest=2625, src=2623001)
        sf = dmr.build_voice_superframe(info, rng=np.random.default_rng(3))
        stream = np.concatenate([rng.integers(0, 4, 90).astype(np.uint8),
                                 sf, rng.integers(0, 4, 60).astype(np.uint8)])
        dec = dmr.DmrDecoder()
        events = []
        for i in range(0, len(stream), 173):   # uneven chunks
            events += dec.feed(stream[i:i + 173])
        emb = [e for e in events if e.get("via") == "embedded"]
        assert emb, f"no embedded LC: {events}"
        assert emb[0]["target"] == 2625
        assert emb[0]["source"] == 2623001


def test_embedded_lc_dedup_with_color_code():
    """Round-5 review regression: decorating the emitted dict must not
    break dedup — identical superframes emit ONCE."""
    info = dmr.lc_info_bits(0, 0, 0, dest=9, src=99)
    dec = dmr.DmrDecoder()
    dec.color_code = 7
    stream = np.concatenate([
        dmr.build_voice_superframe(info, rng=np.random.default_rng(1)),
        dmr.build_voice_superframe(info, rng=np.random.default_rng(2)),
        dmr.build_voice_superframe(info, rng=np.random.default_rng(3))])
    events = dec.feed(stream)
    emb = [e for e in events if e.get("via") == "embedded"]
    assert len(emb) == 1, f"duplicate embedded emissions: {emb}"
    assert emb[0]["color_code"] == 7
