"""End-to-end demodulator chain tests: synthesized IQ → audio parity.

This is the test pyramid the reference lacks (SURVEY.md §4): golden-signal
fixtures through the full Selector → demod → audio path, plus live-control
and graph-surgery behavior.
"""

import numpy as np
import pytest

from openwebrx_tpu.models.receiver import ClientDemodulatorChain, FftChain, build_program
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops.formats import Format, StreamSpec

FS = 2400000.0  # 2.4 MS/s RTL-SDR rate (BASELINE config #1)


def make_nfm_signal(fs, duration, offset_hz, f_audio=1000.0, deviation=3000.0,
                    amplitude=0.5):
    n = np.arange(int(fs * duration))
    mod = np.sin(2 * np.pi * f_audio / fs * n)
    phase = 2 * np.pi * deviation / fs * np.cumsum(mod)
    return (amplitude * np.exp(1j * (2 * np.pi * offset_hz / fs * n + phase))
            ).astype(np.complex64)


def make_am_signal(fs, duration, offset_hz, f_audio=800.0, depth=0.6):
    n = np.arange(int(fs * duration))
    env = 1.0 + depth * np.sin(2 * np.pi * f_audio / fs * n)
    return (0.4 * env * np.exp(2j * np.pi * offset_hz / fs * n)).astype(np.complex64)


def run_chain(chain, x, fs, nblocks=None, target_seconds=0.1):
    prog = build_program(chain, fs, target_seconds=target_seconds)
    n = len(x) // prog.block
    assert n >= 1, f"signal shorter than one block ({prog.block})"
    outs = []
    for blk in np.split(x[: n * prog.block], n):
        y, aux = prog.process(blk)
        outs.append(y)
    return outs, prog


def tone_snr(audio, f_tone, fs_audio):
    """Power at tone frequency vs total out-of-tone power (dB)."""
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio)))) ** 2
    freqs = np.fft.rfftfreq(len(audio), 1 / fs_audio)
    tone_band = (freqs > f_tone * 0.9) & (freqs < f_tone * 1.1)
    rest = (freqs > 50) & ~tone_band
    return 10 * np.log10(spec[tone_band].sum() / spec[rest].sum())


class TestNfmEndToEnd:
    def test_nfm_recovers_tone(self):
        offset = 145000.0
        x = make_nfm_signal(FS, 0.5, offset)
        chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
        chain.set_frequency_offset(offset)
        chain.set_squelch_level(-150.0)
        outs, prog = run_chain(chain, x, FS)
        audio = np.concatenate([np.asarray(o) for o in outs]).astype(np.float32) / 32767
        assert prog.out_spec.rate == 12000.0
        # drop the first block (filter/AGC settle)
        settled = audio[len(audio) // 3:]
        snr = tone_snr(settled, 1000.0, 12000.0)
        assert snr > 20, f"NFM tone SNR {snr:.1f} dB"

    def test_smeter_reports_present(self):
        x = make_nfm_signal(FS, 0.2, 0.0)
        chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
        outs, prog = run_chain(chain, x, FS)
        y, aux = prog.process(x[: prog.block])
        keys = [k for k in aux if "power_db" in k]
        assert keys, f"no s-meter tap in {list(aux)}"
        power = np.asarray(aux[keys[0]])
        assert power.shape[-1] >= 1

    def test_squelch_closes_on_noise(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(int(FS * 0.2)) * 1e-5 +
             1j * rng.standard_normal(int(FS * 0.2)) * 1e-5).astype(np.complex64)
        chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
        chain.set_squelch_level(-40.0)
        outs, prog = run_chain(chain, x, FS)
        audio = np.concatenate([np.asarray(o) for o in outs])
        assert np.abs(audio).max() == 0


class TestAmSsbEndToEnd:
    def test_am_recovers_tone(self):
        offset = -200000.0
        x = make_am_signal(FS, 0.5, offset)
        chain = ClientDemodulatorChain(FS, mode="am", compression="none")
        chain.set_frequency_offset(offset)
        outs, prog = run_chain(chain, x, FS)
        audio = np.concatenate([np.asarray(o) for o in outs]).astype(np.float32) / 32767
        settled = audio[len(audio) // 2:]
        snr = tone_snr(settled, 800.0, 12000.0)
        assert snr > 15, f"AM tone SNR {snr:.1f} dB"

    def test_usb_recovers_tone(self):
        offset = 7000000 % 100000  # arbitrary
        f_audio = 1500.0
        n = np.arange(int(FS * 0.5))
        # USB: audio tone appears offset+f_audio in RF
        x = (0.3 * np.exp(2j * np.pi * (offset + f_audio) / FS * n)).astype(np.complex64)
        chain = ClientDemodulatorChain(FS, mode="usb", compression="none")
        chain.set_frequency_offset(offset)
        outs, prog = run_chain(chain, x, FS)
        audio = np.concatenate([np.asarray(o) for o in outs]).astype(np.float32) / 32767
        settled = audio[len(audio) // 2:]
        snr = tone_snr(settled, f_audio, 12000.0)
        assert snr > 20, f"USB tone SNR {snr:.1f} dB"

    def test_lsb_bandpass_rejects_usb_signal(self):
        # selector-level absolute rejection (the full chain would re-AGC the
        # residual): a +1.5 kHz tone must be crushed by an LSB passband
        from openwebrx_tpu.models.selector import Selector
        from openwebrx_tpu.runtime.chain import Program
        f_audio = 1500.0
        n = np.arange(int(FS * 0.25))
        x = (0.5 * np.exp(2j * np.pi * f_audio / FS * n)).astype(np.complex64)
        sel = Selector(FS, 12000)
        sel.set_bandpass(-3000.0, -300.0)
        prog = Program(sel, StreamSpec(Format.COMPLEX_FLOAT, FS),
                       plan_block_size(sel, StreamSpec(Format.COMPLEX_FLOAT, FS), 0.1))
        y, _ = prog.process(x[: prog.block])
        y, _ = prog.process(x[prog.block: 2 * prog.block])
        out_rms = np.sqrt(np.mean(np.abs(np.asarray(y)) ** 2))
        assert out_rms < 0.5 * 10 ** (-40 / 20), f"LSB leak RMS {out_rms:.2e}"


class TestLiveControls:
    def test_retune_no_recompile(self):
        x = make_nfm_signal(FS, 0.2, 100000.0)
        chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
        prog = build_program(chain, FS, target_seconds=0.1)
        import jax
        chain.set_frequency_offset(50000.0)
        prog.process(x[: prog.block])
        steps0 = prog._step._cache_size()
        chain.set_frequency_offset(100000.0)
        chain.set_squelch_level(-60.0)
        chain.set_bandpass(-5000.0, 5000.0)
        prog.process(x[: prog.block])
        assert prog._step._cache_size() == steps0, "retune caused recompile"

    def test_mode_switch_rebuild(self):
        chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
        prog = build_program(chain, FS, target_seconds=0.05)
        x = make_am_signal(FS, 0.1, 0.0)
        prog.process(x[: prog.block])
        chain.set_mode("am")
        prog.rebuild()
        y, _ = prog.process(x[: prog.block])
        assert np.asarray(y).shape[-1] == prog.out_block


class TestWaterfallChain:
    def test_waterfall_rows(self):
        chain = FftChain(fft_size=4096, fps=9)
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        block = plan_block_size(chain, spec, 0.2)
        from openwebrx_tpu.runtime.chain import Program
        prog = Program(chain, spec, block)
        n = np.arange(block)
        x = np.exp(2j * np.pi * 0.13 * n).astype(np.complex64)
        rows, _ = prog.process(x)
        rows = np.asarray(rows)
        assert rows.ndim == 2 and rows.shape[1] == 4096
        peak = rows[-1].argmax()
        expected = 4096 // 2 + int(round(0.13 * 4096))
        assert abs(int(peak) - expected) <= 1

    def test_compressed_waterfall_matches_host_encoder(self):
        """WaterfallStage(compress=True) must emit byte-identical wire
        payloads to the host-side compress_fft_rows path (the browser
        decoder is shared; reference FftAdpcm, csdr/chain/fft.py:44)."""
        from openwebrx_tpu.ops.adpcm import compress_fft_rows
        from openwebrx_tpu.runtime.chain import Program
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        plain = FftChain(fft_size=512, fps=20)
        packed = FftChain(fft_size=512, fps=20, compress=True)
        block = plan_block_size(plain, spec, 0.2)
        rng = np.random.default_rng(3)
        x = ((rng.standard_normal(block) + 1j * rng.standard_normal(block))
             * 0.2).astype(np.complex64)
        rows, _ = Program(plain, spec, block).process(x)
        words, _ = Program(packed, spec, block).process(x)
        ref = compress_fft_rows(np.asarray(rows))
        nb = packed.waterfall.wire_bytes_per_row
        raw = np.atleast_2d(np.asarray(words))
        raw = raw.view(np.uint8).reshape(raw.shape[0], -1)
        assert raw.shape[0] == len(ref)
        for i, expected in enumerate(ref):
            assert raw[i, :nb].tobytes() == expected


def test_uint8_wire_input_matches_float_path():
    """Packed (n,2) uint8 wire samples through a Program match the float
    path within 8-bit quantization (the rtl-sdr wire; round 5)."""
    import numpy as np
    from openwebrx_tpu.models.selector import Selector
    from openwebrx_tpu.ops.formats import Format, StreamSpec
    from openwebrx_tpu.runtime.chain import Program, host_pack_complex

    fs = 96000.0
    sel = Selector(fs, 12000.0, with_squelch=False)
    sel.set_frequency_offset(10000.0)
    spec = StreamSpec(Format.COMPLEX_FLOAT, fs)
    prog = Program(sel, spec, 9600)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(9600) + 1j * rng.standard_normal(9600)) \
        .astype(np.complex64) * 0.3
    y_f, _ = Program(sel, spec, 9600).process(host_pack_complex(x))
    packed = host_pack_complex(x)
    u8 = np.clip(packed * 128.0 + 127.4, 0, 255).astype(np.uint8)
    y_u, _ = prog.process(u8)
    err = np.abs(np.asarray(y_u) - np.asarray(y_f))
    assert float(err.max()) < 0.02       # 8-bit quantization, filtered
