"""Digimode end-to-end: synthesized PSK31/RTTY/CW signals → decoded text."""

import numpy as np

from openwebrx_tpu.digimodes import psk as pskmod
from openwebrx_tpu.digimodes.rtty import RttyFramer, ITA2_LETTERS, LTRS
from openwebrx_tpu.digimodes.cw import CwDecoder, MORSE
from openwebrx_tpu.models.secondary import PskChain, RttyChain, CwChain
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Program

FS = 48000.0


def run_chain(chain, x):
    spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
    block = plan_block_size(chain, spec, 0.1)
    prog = Program(chain, spec, block)
    outs = []
    n = len(x) // block
    for blk in np.split(x[: n * block], n):
        y, _ = prog.process(blk)
        outs.append(y)
    return outs


def varicode_encode(text: str) -> list[int]:
    bits = []
    for ch in text:
        bits.extend(int(b) for b in pskmod._VARICODE[ord(ch)])
        bits.extend([0, 0])
    return bits


class TestPsk31:
    def test_decode_text(self):
        baud, f0 = 31.25, 2000.0
        text = "cq cq de tpu"
        bits = [0] * 24 + varicode_encode(text) + [0] * 16  # idle = reversals
        sps = FS / baud
        # DBPSK: bit 1 → keep phase, 0 → flip
        phases = [1.0]
        for b in bits:
            phases.append(phases[-1] * (1.0 if b else -1.0))
        sym = np.repeat(phases, int(sps))
        n = np.arange(len(sym))
        x = (0.5 * sym * np.exp(2j * np.pi * f0 / FS * n)).astype(np.complex64)

        chain = PskChain(FS, baud)
        chain.set_frequency_offset(f0)
        outs = run_chain(chain, x)
        symbols = np.concatenate([np.asarray(o) for o in outs])
        rx_bits = pskmod.dbpsk_bits(symbols)
        decoder = pskmod.VaricodeDecoder()
        decoded = decoder.decode(rx_bits)
        assert text in decoded, f"decoded: {decoded!r}"


class TestRtty:
    def test_framer_roundtrip(self):
        framer = RttyFramer()
        # encode "RY" in ITA2 letters mode: R=0x0A, Y=0x15
        bits = [1, 1, 1]
        for code in (LTRS, ITA2_LETTERS.index("R"), ITA2_LETTERS.index("Y")):
            bits.append(0)                                # start
            bits.extend((code >> i) & 1 for i in range(5))  # LSB first
            bits.extend([1, 1])                           # stop
        out = framer.decode(np.array(bits))
        assert out == "RY"

    def test_decode_signal(self):
        baud, shift, f0 = 45.45, 170.0, 1500.0
        codes = [LTRS] + [ITA2_LETTERS.index(c) for c in "RYRYRY"]
        bits = [1] * 8
        for code in codes:
            bits.append(0)
            bits.extend((code >> i) & 1 for i in range(5))
            bits.extend([1, 1])
        bits += [1] * 8
        sps = FS / baud
        # FSK: mark (1) = +shift/2, space (0) = −shift/2 around f0
        freq = np.repeat([f0 + (shift / 2 if b else -shift / 2) for b in bits],
                         int(round(sps)))
        phase = 2 * np.pi * np.cumsum(freq) / FS
        x = (0.5 * np.exp(1j * phase)).astype(np.complex64)

        chain = RttyChain(FS, baud, shift)
        chain.set_frequency_offset(f0)
        outs = run_chain(chain, x)
        symbols = np.concatenate([np.asarray(o) for o in outs])
        rx_bits = (symbols.real > 0).astype(np.uint8)
        framer = RttyFramer()
        decoded = framer.decode(rx_bits)
        assert "RYRY" in decoded, f"decoded: {decoded!r}"


class TestCw:
    def test_decoder_direct(self):
        rate, wpm = 500.0, 20.0
        dit = rate * 1.2 / wpm
        env = []
        def key(on, units):
            env.extend([1.0 if on else 0.0] * int(units * dit))
        for ch in "PARIS":
            for j, sym in enumerate(MORSE_INV[ch]):
                if j:
                    key(False, 1)
                key(True, 1 if sym == "." else 3)
            key(False, 3)
        key(False, 6)
        decoder = CwDecoder(rate, wpm_hint=wpm)
        decoded = decoder.decode(np.array(env) + 0.01)
        assert "PARIS" in decoded.replace(" ", ""), f"decoded: {decoded!r}"

    def test_decode_signal(self):
        f0 = 800.0
        rate, wpm = FS, 20.0
        dit = 1.2 / wpm  # seconds
        env = []
        def key(on, units):
            env.extend([1.0 if on else 0.0] * int(units * dit * FS))
        for ch in "TEST":
            for j, sym in enumerate(MORSE_INV[ch]):
                if j:
                    key(False, 1)
                key(True, 1 if sym == "." else 3)
            key(False, 3)
        key(False, 8)
        env = np.array(env)
        n = np.arange(len(env))
        x = (0.6 * env * np.exp(2j * np.pi * f0 / FS * n)).astype(np.complex64)

        chain = CwChain(FS)
        chain.set_frequency_offset(f0)
        outs = run_chain(chain, x)
        envelope = np.concatenate([np.asarray(o) for o in outs])
        decoder = CwDecoder(CwChain.ENV_RATE, wpm_hint=wpm)
        decoded = decoder.decode(envelope)
        assert "TEST" in decoded.replace(" ", ""), f"decoded: {decoded!r}"


MORSE_INV = {v: k for k, v in MORSE.items()}
