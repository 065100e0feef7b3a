"""Waterfall FFT pipeline + overlap-save bandpass + ADPCM codec tests."""

import numpy as np
import scipy.signal as sig

from openwebrx_tpu.ops import fftops, bandpass, firdes, adpcm, fir


class TestWaterfall:
    def test_tone_lands_in_right_bin(self):
        fs, size = 48000.0, 1024
        n = np.arange(size * 8)
        f = 6000.0
        x = np.exp(2j * np.pi * f / fs * n).astype(np.complex64)
        hist = fftops.fft_init(size, size)
        w = fftops.hann_window(size)
        _, p = fftops.fft_power(hist, w, x, size, size)
        rows = fftops.log_average(p, averages=8)
        row = np.asarray(fftops.fft_swap(rows))[0]
        peak_bin = int(np.argmax(row))
        expected = size // 2 + int(round(f / fs * size))
        assert abs(peak_bin - expected) <= 1

    def test_level_calibration(self):
        # full-scale tone → ~(0 + add_db) dB after window loss (~−6 dB hann)
        fs, size = 48000.0, 1024
        x = np.exp(2j * np.pi * 0.1 * np.arange(size * 4)).astype(np.complex64)
        hist = fftops.fft_init(size, size)
        _, p = fftops.fft_power(hist, fftops.hann_window(size), x, size, size)
        rows = np.asarray(fftops.log_average(p, averages=4, add_db=0.0))
        assert -8.0 < rows[0].max() < -4.0

    def test_streaming_continuity(self):
        rng = np.random.default_rng(0)
        size = 256
        x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
        w = fftops.hann_window(size)
        hist = fftops.fft_init(size, size)
        _, p_whole = fftops.fft_power(hist, w, x, size, size)
        rows = []
        hist = fftops.fft_init(size, size)
        for blk in np.split(x, 4):
            hist, p = fftops.fft_power(hist, w, blk, size, size)
            rows.append(np.asarray(p))
        np.testing.assert_allclose(np.concatenate(rows, axis=0),
                                   np.asarray(p_whole), rtol=1e-3, atol=1e-2)

    def test_params_math(self):
        # 2.4 MS/s, 4096 bins, 9 fps → averaging path
        every_n, avgs = fftops.waterfall_params(2.4e6, 4096, 9)
        assert every_n == 4096 and avgs == 65
        # slow rate → sparse frames
        every_n, avgs = fftops.waterfall_params(12000, 2048, 9)
        assert avgs == 1 and every_n == 1333


class TestBandpassFft:
    def test_matches_time_domain(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
        lo, hi, tbw = -0.1, 0.2, 0.02
        taps = firdes.bandpass_taps(lo, hi, tbw)
        ntaps = len(taps)
        nfft = bandpass.plan_nfft(ntaps, 1024)
        resp = firdes.bandpass_response(lo, hi, tbw, nfft)
        tail = bandpass.bandpass_init(ntaps)
        outs = []
        for blk in np.split(x, 4):
            tail, y = bandpass.bandpass_apply(tail, resp, blk, ntaps, nfft)
            outs.append(np.asarray(y))
        y = np.concatenate(outs)
        golden = sig.lfilter(taps, [1.0], x)
        np.testing.assert_allclose(y, golden, rtol=1e-3, atol=1e-3)

    def test_rejects_out_of_band(self):
        fs = 12000.0
        n = np.arange(12000)
        inband = np.exp(2j * np.pi * 1000 / fs * n)
        outband = np.exp(2j * np.pi * 4000 / fs * n)
        x = (inband + outband).astype(np.complex64)
        lo, hi, tbw = 300 / fs, 2700 / fs, 320 / fs
        ntaps = firdes.bandpass_ntaps(tbw)
        nfft = bandpass.plan_nfft(ntaps, 3000)
        resp = firdes.bandpass_response(lo, hi, tbw, nfft)
        tail = bandpass.bandpass_init(ntaps)
        outs = []
        for blk in np.split(x, 4):
            tail, y = bandpass.bandpass_apply(tail, resp, blk, ntaps, nfft)
            outs.append(np.asarray(y))
        y = np.concatenate(outs)[2000:]
        spec = np.abs(np.fft.fft(y))
        freqs = np.fft.fftfreq(len(y), 1 / fs)
        pin = spec[np.argmin(np.abs(freqs - 1000))]
        pout = spec[np.argmin(np.abs(freqs - 4000))]
        assert 20 * np.log10(pin / max(pout, 1e-12)) > 40


class TestAdpcm:
    def test_roundtrip_snr(self):
        """Wire-contract roundtrip: each STATE_STRIDE-byte stride decodes
        from its exported reseed state (what the sync headers deliver)."""
        fs = 12000
        n = np.arange(fs)
        audio = (0.5 * np.sin(2 * np.pi * 440 / fs * n)).astype(np.float32)
        state = adpcm.adpcm_init()
        samples = (audio * 32767).astype(np.int16)
        import jax.numpy as jnp
        state, (bytes_, stride) = adpcm.adpcm_encode(state, jnp.asarray(samples))
        data = np.asarray(bytes_)
        stride = np.asarray(stride)
        decoded = []
        st = (0, 0)
        for k in range(len(data) // adpcm.STATE_STRIDE):
            chunk = bytes(data[k * adpcm.STATE_STRIDE:(k + 1) * adpcm.STATE_STRIDE])
            d, _ = adpcm.adpcm_decode_np(chunk, st)
            decoded.append(d)
            st = adpcm.unpack_codec_state(int(stride[k]))
        decoded = np.concatenate(decoded)
        m = len(decoded)
        err = decoded.astype(np.float32) / 32767 - audio[:m]
        snr = 10 * np.log10(np.mean(audio[:m] ** 2) / np.mean(err**2))
        assert snr > 25, f"ADPCM SNR {snr:.1f} dB"

    def test_seq_state_snapshots_match_decoder(self):
        """The sequential (waterfall-row) encoder keeps the exact-IMA
        invariant: exported stride state == continuous decoder state."""
        rng = np.random.default_rng(2)
        audio = (rng.standard_normal(2000) * 8000).astype(np.int16)
        import jax.numpy as jnp
        state = adpcm.adpcm_init()
        state, (bytes_, stride) = adpcm.adpcm_encode_seq(state, jnp.asarray(audio))
        data = bytes(np.asarray(bytes_))
        stride = np.asarray(stride)
        for k in (200, 400, 1000):
            _, (pred, idx) = adpcm.adpcm_decode_np(data[:k])
            spred, sidx = adpcm.unpack_codec_state(stride[k // adpcm.STATE_STRIDE - 1])
            assert pred == spred
            assert idx == sidx

    def test_strided_reseed_is_exact_predictor(self):
        """The strided encoder's exported reseeds: predictor equals the raw
        sample just before the stride, so the decoder restarts with zero
        predictor discontinuity."""
        rng = np.random.default_rng(9)
        audio = (rng.standard_normal(1000) * 8000).astype(np.int16)
        import jax.numpy as jnp
        _, (_b, stride) = adpcm.adpcm_encode(adpcm.adpcm_init(),
                                             jnp.asarray(audio))
        stride = np.asarray(stride)
        for k in range(len(stride)):
            pred, idx = adpcm.unpack_codec_state(int(stride[k]))
            assert pred == int(audio[(k + 1) * 2 * adpcm.STATE_STRIDE - 1])
            assert 0 <= idx <= 88

    def test_sync_framer_stream(self):
        rng = np.random.default_rng(3)
        import jax.numpy as jnp
        framer = adpcm.SyncFramer()
        state = adpcm.adpcm_init()
        wire = bytearray()
        original = []
        for _ in range(4):
            audio = (rng.standard_normal(1200) * 8000).astype(np.int16)
            original.append(audio)
            state, (b, stride) = adpcm.adpcm_encode(state, jnp.asarray(audio))
            wire += framer.frame(np.asarray(b), np.asarray(stride))
        decoded = _decode_with_sync(bytes(wire))
        orig = np.concatenate(original)
        err = (decoded.astype(np.float32) - orig.astype(np.float32)) / 32767
        snr = 10 * np.log10(np.mean((orig / 32767.0) ** 2) / np.mean(err**2))
        assert snr > 10


def _decode_with_sync(data: bytes) -> np.ndarray:
    """Reimplementation of the browser decodeWithSync state machine
    (reference htdocs/lib/AudioEngine.js:449-487) for wire-format tests."""
    out = []
    phase, synced, counter = 0, 0, 0
    sync_buf = bytearray()
    pred, idx = 0, 0
    i = 0
    state = (0, 0)
    while i < len(data):
        b = data[i]
        if phase == 0:
            synced = synced + 1 if b == b"SYNC"[synced] else 0
            if synced == 4:
                sync_buf = bytearray()
                phase = 1
                synced = 0
        elif phase == 1:
            sync_buf.append(b)
            if len(sync_buf) == 4:
                idx, pred = np.frombuffer(bytes(sync_buf), "<i2")
                state = (int(pred), int(idx))
                counter = adpcm.SYNC_INTERVAL - 1
                phase = 2
        else:
            samples, state = adpcm.adpcm_decode_np(bytes([b]), state)
            out.append(samples)
            counter -= 1
            if counter < 0:
                phase = 0
        i += 1
    return np.concatenate(out) if out else np.empty(0, np.int16)
