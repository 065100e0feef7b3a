"""SecondaryHandle wiring for the maritime telex + image modes:
SITOR-B / NAVTEX / DSC ride the 100 Bd FSK chain, SSTV/FAX the subcarrier
frequency chain — all native, end-to-end from synthesized IQ to panel text
(reference: csdr/chain/digimodes.py:185-322 secondary demodulators)."""

import json
import types

import numpy as np

from openwebrx_tpu.digimodes.dsc import (
    EOS_REQ, FMT_SELECTIVE, encode_call,
)
from openwebrx_tpu.digimodes.sitor import encode_fec
from openwebrx_tpu.runtime.device import SecondaryHandle

FS = 48000.0
BAUD = 100.0
SHIFT = 170.0


def fsk_iq(bits, f0: float, baud: float = BAUD, shift: float = SHIFT,
           preamble: int = 60, postamble: int = 120) -> np.ndarray:
    """Mark-idle preamble (all ones: never a valid weight-4 codeword
    window) then the bit stream as FSK around f0; trailing idle flushes
    the block accumulator and the FEC RX copies."""
    bits = [1] * preamble + list(bits) + [1] * postamble
    sps = int(round(FS / baud))
    freq = np.repeat([f0 + (shift / 2 if b else -shift / 2) for b in bits], sps)
    phase = 2 * np.pi * np.cumsum(freq) / FS
    return (0.5 * np.exp(1j * phase)).astype(np.complex64)


def words_to_bits(words):
    """SITOR codewords → bit stream, LSB first per 7-bit word."""
    bits = []
    for w in words:
        bits.extend((w >> i) & 1 for i in range(7))
    return bits


def run_handle(mode: str, x: np.ndarray) -> str:
    runtime = types.SimpleNamespace(in_rate=FS)
    handle = SecondaryHandle(runtime, mode, offset_hz=0.0)
    collected = []
    handle.text_cb = collected.append
    handle.set_offset(1000.0)
    # feed in device-sized chunks like the engine loop does
    step = 1 << 14
    for i in range(0, len(x), step):
        handle.feed(x[i: i + step])
    return "".join(collected)


class TestSitorB:
    def test_text_over_iq(self):
        words = encode_fec("RYRYRY TEST DE TPU")
        x = fsk_iq(words_to_bits(words), 1000.0)
        text = run_handle("sitorb", x)
        assert "TEST DE TPU" in text, f"decoded: {text!r}"


class TestNavtex:
    def test_message_framing(self):
        body = "ZCZC FA01 SECURITE TEST NNNN"
        words = encode_fec("RYRY " + body + " RYRY")
        x = fsk_iq(words_to_bits(words), 1000.0)
        out = run_handle("navtex", x)
        messages = [json.loads(l) for l in out.splitlines() if l.strip()]
        assert messages, f"no NAVTEX messages in {out!r}"
        msg = messages[0]
        assert msg["mode"] == "NAVTEX"
        assert msg["station"] == "F"
        assert msg["type"] == "A"
        assert "SECURITE TEST" in msg["message"]


class TestDsc:
    def test_selective_call_over_iq(self):
        bits = encode_call(FMT_SELECTIVE, "2113456780", 108, [26, 0],
                           eos=EOS_REQ)
        x = fsk_iq(bits, 1000.0)
        out = run_handle("dsc", x)
        messages = [json.loads(l) for l in out.splitlines() if l.strip()]
        assert messages, f"no DSC messages in {out!r}"
        msg = messages[0]
        assert msg["mode"] == "DSC"
        assert msg["format"] == "selective"
        assert msg["address"] == "2113456780"
        assert msg["eos"] == "ack required"


class TestFaxInteractive:
    def test_rows_stream_as_json(self):
        from openwebrx_tpu.models.fax import CARRIER_HZ, DEVIATION_HZ

        lpm = 120.0
        spl_audio = int(FS * 60.0 / lpm)
        width = 200
        phasing = np.full((6, width), 255, np.uint8)
        phasing[:, : max(1, int(0.025 * width))] = 0
        img = np.zeros((8, width), np.uint8)
        img[:, width // 2:] = 255
        pattern = np.concatenate([phasing, img])

        lines = []
        for row in pattern:
            px = np.repeat(row, spl_audio // len(row) + 1)[:spl_audio]
            lines.append(CARRIER_HZ + (px / 255.0 * 2 - 1) * DEVIATION_HZ)
        freq = np.concatenate(lines)
        phase = 2 * np.pi * np.cumsum(freq + 1000.0) / FS
        x = (0.5 * np.exp(1j * phase)).astype(np.complex64)

        out = run_handle("fax", x)
        rows = [json.loads(l) for l in out.splitlines() if l.strip()]
        assert len(rows) >= 8, f"only {len(rows)} fax rows"
        assert rows[0]["mode"] == "Fax"
        assert rows[0]["width"] > 0
        import base64
        px = np.frombuffer(base64.b64decode(rows[-1]["pixels"]), np.uint8)
        assert len(px) == rows[-1]["width"]
