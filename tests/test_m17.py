"""Native M17 link layer (round 5): base-40 callsigns, P1-punctured
convolutional LSF, QPP interleave + decorrelator, LICH reassembly —
round-trip validated (no off-air M17 captures exist in this image; see
digimodes/m17.py docstring).  Reference needs the m17-demod binary for
any of this (csdr/chain/m17.py)."""

import numpy as np

from openwebrx_tpu.digimodes import m17

rng = np.random.default_rng(11)


class TestCallsigns:
    def test_base40_roundtrip(self):
        for call in ("W1AW", "SP5WWP", "N0CALL", "DK1AB-9", "A1BC/P"):
            assert m17.decode_callsign(m17.encode_callsign(call)) == call

    def test_broadcast(self):
        assert m17.encode_callsign("@ALL") == 0xFFFFFFFFFFFF
        assert m17.decode_callsign(0xFFFFFFFFFFFF) == "@ALL"


class TestLsf:
    def test_encode_decode(self):
        bits = m17.lsf_encode("N0CALL", "SP5WWP", type_bits=0x0005 | (3 << 7))
        lsf = m17.lsf_decode(bits)
        assert lsf["source"] == "SP5WWP"
        assert lsf["target"] == "N0CALL"
        assert lsf["mode"] == "stream"
        assert lsf["can"] == 3

    def test_crc_rejects_corruption(self):
        bits = m17.lsf_encode("N0CALL", "SP5WWP")
        bad = bits.copy()
        bad[10] ^= 1
        assert m17.lsf_decode(bad) is None

    def test_payload_roundtrip_with_channel_errors(self):
        """240 LSF bits → conv+puncture+interleave+decorrelate 368 bits →
        back, with scattered bit errors healed by the Viterbi."""
        bits = m17.lsf_encode("@ALL", "W1AW")
        tx = m17.lsf_to_payload(bits)
        assert len(tx) == 368
        lsf = m17.payload_to_lsf(tx)
        assert lsf and lsf["source"] == "W1AW" and lsf["target"] == "@ALL"
        e = tx.copy()
        for p in rng.choice(368, 6, replace=False):
            e[p] ^= 1
        lsf = m17.payload_to_lsf(e)
        assert lsf and lsf["source"] == "W1AW"


class TestLich:
    def test_chunks_reassemble(self):
        bits = m17.lsf_encode("N0CALL", "SP5WWP")
        frags = {}
        for i, chunk in enumerate(m17.lich_chunks(bits)):
            idx, frag = m17.decode_lich(chunk)
            frags[idx] = frag
            assert idx == i
        full = np.concatenate([frags[i] for i in range(6)])
        assert np.array_equal(full, bits)

    def test_golay_heals_chunk_errors(self):
        bits = m17.lsf_encode("N0CALL", "SP5WWP")
        chunk = m17.lich_chunks(bits)[2].copy()
        for p in rng.choice(96, 3, replace=False):
            chunk[p] ^= 1
        got = m17.decode_lich(chunk)
        assert got is not None and got[0] == 2


class TestStream:
    def test_lsf_frame_decodes(self):
        frame = m17.build_lsf_frame("N0CALL", "SP5WWP")
        stream = np.concatenate([rng.integers(0, 4, 113).astype(np.uint8),
                                 frame,
                                 rng.integers(0, 4, 50).astype(np.uint8)])
        dec = m17.M17Decoder()
        events = []
        for i in range(0, len(stream), 131):
            events += dec.feed(stream[i:i + 131])
        assert events and events[0]["source"] == "SP5WWP"
        assert events[0]["target"] == "N0CALL"

    def test_lich_reassembly_from_stream_frames(self):
        """Join mid-transmission: no LSF frame seen, the six LICH chunks
        in the stream frames rebuild it."""
        bits = m17.lsf_encode("N0CALL", "SP5WWP")
        frames = [m17.build_stream_frame(bits, i) for i in range(6)]
        stream = np.concatenate(
            [rng.integers(0, 4, 77).astype(np.uint8)] + frames)
        dec = m17.M17Decoder()
        events = dec.feed(stream)
        lich_events = [e for e in events if e.get("via") == "lich"]
        assert lich_events, events
        assert lich_events[0]["source"] == "SP5WWP"
        assert lich_events[0]["target"] == "N0CALL"


class TestEndToEnd:
    def test_native_m17_metadata_from_c4fm_iq(self):
        """C4FM IQ of an LSF frame at the 48 kHz IF → cs16 wire bytes →
        TPU symbol chain → native M17 link layer → callsign metadata
        (M17MetaTap consumes the SAME cs16 stream the external decoder
        gets — no second full-rate program per listener)."""
        import sys
        sys.path.insert(0, "tests")
        from test_digital_voice import c4fm_waveform
        from openwebrx_tpu.runtime.device import M17MetaTap

        frame = m17.build_lsf_frame("N0CALL", "SP5WWP")
        idle = rng.integers(0, 4, 150).astype(np.uint8)
        stream = np.concatenate([idle, frame, frame, frame, idle])
        x = c4fm_waveform(stream, baud=4800.0, dev_hz=800.0,
                          fs=M17MetaTap.IF_RATE, rrc_alpha=0.5)

        metas = []
        tap = M17MetaTap(metas.append)
        interleaved = np.empty(2 * len(x), np.int16)
        interleaved[0::2] = np.clip(x.real * 32767, -32768, 32767)
        interleaved[1::2] = np.clip(x.imag * 32767, -32768, 32767)
        wire = interleaved.tobytes()
        step = 4096 * 4
        for i in range(0, len(wire), step):
            tap.feed_cs16(wire[i:i + step])
        lsfs = [m for m in metas if m.get("source")]
        assert lsfs, f"no LSF decoded: {metas}"
        assert lsfs[0]["source"] == "SP5WWP"
        assert lsfs[0]["target"] == "N0CALL"
