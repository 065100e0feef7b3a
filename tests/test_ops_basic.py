"""NCO shift, first-order IIR, demodulators, AGC, squelch: golden tests."""

import numpy as np
import scipy.signal as sig

from openwebrx_tpu.ops import nco, iir, demod, agc, squelch


class TestShift:
    def test_shift_moves_tone(self):
        fs = 48000.0
        n = np.arange(4800)
        tone = np.exp(2j * np.pi * 5000 / fs * n).astype(np.complex64)
        phase = nco.shift_init()
        _, y = nco.shift_apply(phase, -5000 / fs, tone)
        y = np.asarray(y)
        # after shifting by −5 kHz the tone sits at DC
        assert np.abs(np.mean(y)) > 0.999

    def test_streaming_phase_continuity(self):
        rate = 0.01237  # awkward fraction of 2π per block
        x = np.ones(4096, np.complex64)
        phase = nco.shift_init()
        outs = []
        for blk in np.split(x, 8):
            phase, y = nco.shift_apply(phase, rate, blk)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs)
        _, y_whole = nco.shift_apply(nco.shift_init(), rate, x)
        np.testing.assert_allclose(y_stream, np.asarray(y_whole), atol=2e-3)

    def test_batched_rates(self):
        x = np.ones((4, 1024), np.complex64)
        rates = np.array([0.1, -0.1, 0.25, 0.0], np.float32)
        phase = nco.shift_init((4,))
        _, y = nco.shift_apply(phase, rates, x)
        y = np.asarray(y)
        for c in range(4):
            _, yc = nco.shift_apply(nco.shift_init(), rates[c], x[c])
            np.testing.assert_allclose(y[c], np.asarray(yc), atol=1e-5)


class TestIir:
    def test_first_order_matches_lfilter(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(4000).astype(np.float32)
        b0, b1, a1 = 0.3, -0.2, 0.9
        state = iir.first_order_init()
        _, y = iir.first_order_apply(state, b0, b1, a1, x)
        golden = sig.lfilter([b0, b1], [1.0, -a1], x)
        np.testing.assert_allclose(np.asarray(y), golden, rtol=1e-3, atol=1e-4)

    def test_streaming_equals_batch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(4000).astype(np.float32)
        b0, b1, a1 = iir.dc_block_coeffs(12000.0)
        state = iir.first_order_init()
        outs = []
        for blk in np.split(x, 10):
            state, y = iir.first_order_apply(state, b0, b1, a1, blk)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs)
        _, y_whole = iir.first_order_apply(iir.first_order_init(), b0, b1, a1, x)
        np.testing.assert_allclose(y_stream, np.asarray(y_whole), rtol=1e-3, atol=1e-4)

    def test_dc_block_removes_dc(self):
        x = (np.ones(12000) * 0.7).astype(np.float32)
        b0, b1, a1 = iir.dc_block_coeffs(12000.0)
        _, y = iir.first_order_apply(iir.first_order_init(), b0, b1, a1, x)
        assert abs(np.asarray(y)[-100:].mean()) < 1e-3

    def test_deemphasis_response(self):
        # −3 dB at 1/(2π·tau)
        fs, tau = 48000.0, 50e-6
        b0, b1, a1 = iir.deemphasis_coeffs(fs, tau)
        w, h = sig.freqz([b0, b1], [1.0, -a1], fs=fs)
        fc = 1.0 / (2 * np.pi * tau)
        gain_fc = np.interp(fc, w, np.abs(h))
        assert 0.6 < gain_fc < 0.8  # ≈ 1/√2


class TestFmDemod:
    def test_tone(self):
        fs = 48000.0
        f_mod = 1000.0
        deviation = 5000.0
        n = np.arange(9600)
        # FM: phase = 2π·dev/f_mod·... integrate modulating sine
        mod = np.sin(2 * np.pi * f_mod / fs * n)
        phase = 2 * np.pi * deviation / fs * np.cumsum(mod)
        x = np.exp(1j * phase).astype(np.complex64)
        prev = demod.fm_init()
        _, y = demod.fm_demod(prev, x)
        y = np.asarray(y)[100:]
        # output ≈ (2·dev/fs)·mod (instantaneous freq / (fs/2))
        # phase[n] − phase[n−1] = 2π·dev/fs·mod[n] ⇒ y[n] aligns with mod[n]
        expected = 2 * deviation / fs * mod[100:]
        assert np.corrcoef(y, expected)[0, 1] > 0.999
        np.testing.assert_allclose(y.max(), 2 * deviation / fs, rtol=0.05)

    def test_am(self):
        n = np.arange(4800)
        env = 1.0 + 0.5 * np.sin(2 * np.pi * 0.01 * n)
        x = (env * np.exp(2j * np.pi * 0.1 * n)).astype(np.complex64)
        y = np.asarray(demod.am_demod(x))
        np.testing.assert_allclose(y, env, rtol=1e-3)

    def test_sync_am_locks(self):
        fs = 12000.0
        n = np.arange(24000)
        carrier_off = 37.0  # Hz residual carrier
        audio = 0.3 * np.sin(2 * np.pi * 400 / fs * n)
        x = ((1 + audio) * np.exp(2j * np.pi * carrier_off / fs * n)).astype(np.complex64)
        state = demod.sync_am_init()
        outs = []
        for blk in np.split(x, 20):
            state, y = demod.sync_am_demod(state, blk)
            outs.append(np.asarray(y))
        y = np.concatenate(outs)[-6000:]
        # after lock, output ≈ 1 + audio: correlate AC component
        ac = y - y.mean()
        ref = audio[-6000:]
        assert np.corrcoef(ac, ref)[0, 1] > 0.99


class TestAgc:
    def test_scales_to_reference(self):
        x = (0.01 * np.sin(2 * np.pi * 0.01 * np.arange(4000))).astype(np.float32)
        state = agc.agc_init(agc.FAST)
        for _ in range(6):
            state, y = agc.agc_apply(state, agc.FAST, x)
        peak = np.abs(np.asarray(y)).max()
        assert 0.4 < peak < 1.2  # near the 0.8 reference

    def test_attack_prevents_clipping_growth(self):
        loud = np.ones(4000, np.float32) * 5.0
        state = agc.agc_init(agc.FAST)
        state, y = agc.agc_apply(state, agc.FAST, loud)
        # gain must come down within the first block
        assert np.abs(np.asarray(y)[-512:]).max() < 1.5


class TestSquelch:
    def test_gates_noise_passes_signal(self):
        rng = np.random.default_rng(0)
        window = 750
        quiet = (rng.standard_normal(1500) * 1e-4).astype(np.complex64)
        loud = (rng.standard_normal(1500) * 1.0).astype(np.complex64)
        state = squelch.squelch_init()
        state, gq, pq = squelch.squelch_apply(state, -40.0, quiet, window)
        # hang keeps it open briefly after signal; from cold start gate closed
        assert np.abs(np.asarray(gq)).max() == 0.0
        state, gl, pl = squelch.squelch_apply(state, -40.0, loud, window)
        assert np.abs(np.asarray(gl)).max() > 0.1
        assert np.asarray(pl).mean() > np.asarray(pq).mean() + 30

    def test_level_off_passes_everything(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(1500) * 1e-4).astype(np.complex64)
        state = squelch.squelch_init()
        _, g, _ = squelch.squelch_apply(state, -150.0, x, 750)
        np.testing.assert_allclose(np.asarray(g), x, atol=1e-7)
