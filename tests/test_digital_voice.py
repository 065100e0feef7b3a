"""Digital-voice symbol front-end: synthesized C4FM → recovered dibits."""

import numpy as np

from openwebrx_tpu.models.digital_voice import DV_FACTORY, DvSymbolChain
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops import fsk
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Program

FS = 240000.0  # device rate (decimates to the 48 kHz DV IF)


def c4fm_waveform(dibits, baud=4800.0, dev_hz=648.0, fs=FS, offset_hz=0.0,
                  rrc_alpha=0.2):
    """4FSK at ±dev, ±3·dev with transmitter RRC pulse shaping (C4FM per
    ETSI TS 102 361-1: the frequency pulses are RRC-shaped, so the
    receiver's matched RRC yields an ISI-free raised-cosine eye)."""
    from openwebrx_tpu.ops.firdes import root_raised_cosine_taps
    level = {0b00: 1.0, 0b01: 3.0, 0b10: -1.0, 0b11: -3.0}
    sps = int(fs / baud)
    impulses = np.zeros(len(dibits) * sps)
    impulses[::sps] = [level[d] for d in dibits]
    taps = root_raised_cosine_taps(sps, rrc_alpha)
    taps = taps * sps / taps.sum()  # unit gain for an impulse-per-symbol train
    freqs = np.convolve(impulses, taps, mode="same") * dev_hz
    phase = 2 * np.pi * np.cumsum(freqs + offset_hz) / fs
    return (0.5 * np.exp(1j * phase)).astype(np.complex64)


def run_chain(chain, x):
    spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
    block = plan_block_size(chain, spec, 0.1)
    prog = Program(chain, spec, block)
    outs = []
    n = len(x) // block
    for blk in np.split(x[: n * block], n):
        y, _ = prog.process(blk)
        outs.append(np.asarray(y))
    return np.concatenate(outs)


class TestFsk4Slice:
    def test_levels_map_to_dibits(self):
        y = np.array([3.0, 1.0, -1.0, -3.0, 2.9, -0.9], np.float32)
        out = np.asarray(fsk.fsk4_slice(y))
        assert list(out) == [0b01, 0b00, 0b10, 0b11, 0b01, 0b10]

    def test_scale_invariance(self):
        rng = np.random.default_rng(1)
        dibits = rng.integers(0, 4, 500)
        level = np.array([1.0, 3.0, -1.0, -3.0])[dibits]
        for gain in (0.01, 1.0, 250.0):
            out = np.asarray(fsk.fsk4_slice((level * gain).astype(np.float32)))
            assert np.array_equal(out, np.asarray(fsk.fsk4_slice(
                level.astype(np.float32))))


class TestDvChain:
    def _run(self, mode, baud, dev):
        rng = np.random.default_rng(7)
        dibits = rng.integers(0, 4, 2400)
        x = c4fm_waveform(dibits, baud=baud, dev_hz=dev)
        chain = DV_FACTORY[mode](FS)
        chain.set_frequency_offset(0.0)
        out = run_chain(chain, x)
        # the chain is causal (selector bandpass + RRC group delay ≈ 35
        # symbols), so the output LAGS the transmitted dibits: align by
        # trimming the head of `out`.  score past the filter warm-up.
        best = 0.0
        for lag in range(0, 80):
            b = out[lag:]
            n = min(len(dibits), len(b))
            if n < 500:
                continue
            agree = np.mean(dibits[200:n] == b[200:n])
            best = max(best, agree)
        return best

    def test_dmr_symbols_recovered(self):
        agree = self._run("dmr", 4800.0, 648.0)
        assert agree > 0.95, f"symbol agreement {agree:.3f}"

    def test_nxdn_symbols_recovered(self):
        agree = self._run("nxdn", 2400.0, 350.0)
        assert agree > 0.95, f"symbol agreement {agree:.3f}"

    def test_chain_modes_present(self):
        assert set(DV_FACTORY) == {"dmr", "ysf", "dstar", "nxdn", "m17"}
        assert isinstance(DV_FACTORY["ysf"](FS), DvSymbolChain)
