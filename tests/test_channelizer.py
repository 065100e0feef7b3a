"""Polyphase filterbank channelizer tests."""

import numpy as np

from openwebrx_tpu.ops import channelizer as pfb


class TestChannelizer:
    def test_tones_land_in_their_channels(self):
        m, fs = 16, 160000.0
        proto = pfb.design_prototype(m)
        freqs = pfb.channel_frequencies(m, fs)
        # tones at channel centers 2, 5, and 13 (negative)
        n = np.arange(m * 2000)
        x = sum(np.exp(2j * np.pi * freqs[k] / fs * n) for k in (2, 5, 13))
        x = x.astype(np.complex64)
        tail = pfb.channelizer_init(m, len(proto) // m)
        _, y = pfb.channelize(tail, proto, x, m)
        y = np.asarray(y)
        assert y.shape == (m, len(n) // m)
        power = np.mean(np.abs(y) ** 2, axis=1)
        hot = set(np.flatnonzero(power > 0.2))
        assert hot == {2, 5, 13}, f"hot channels {hot}"
        # isolation: quiet channels at least 40 dB down
        quiet = np.delete(power, [2, 5, 13])
        assert 10 * np.log10(quiet.max() / power[2]) < -40

    def test_offset_tone_appears_at_offset(self):
        m, fs = 8, 80000.0
        proto = pfb.design_prototype(m)
        delta = 1200.0  # Hz inside channel 3 (center 30 kHz)
        n = np.arange(m * 4000)
        x = np.exp(2j * np.pi * (30000 + delta) / fs * n).astype(np.complex64)
        tail = pfb.channelizer_init(m, len(proto) // m)
        _, y = pfb.channelize(tail, proto, x, m)
        ch = np.asarray(y)[3][500:]
        ch_rate = fs / m
        spec = np.abs(np.fft.fft(ch * np.hanning(len(ch))))
        f = np.fft.fftfreq(len(ch), 1 / ch_rate)
        peak_f = f[np.argmax(spec)]
        assert abs(peak_f - delta) < ch_rate / len(ch) * 2

    def test_streaming_continuity(self):
        m = 8
        proto = pfb.design_prototype(m)
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(8 * 3000) + 1j * rng.standard_normal(8 * 3000)
             ).astype(np.complex64)
        tail = pfb.channelizer_init(m, len(proto) // m)
        _, y_whole = pfb.channelize(tail, proto, x, m)
        tail = pfb.channelizer_init(m, len(proto) // m)
        outs = []
        for blk in np.split(x, 3):
            tail, y = pfb.channelize(tail, proto, blk, m)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(y_stream, np.asarray(y_whole), atol=1e-4)

    def test_matches_direct_downconversion(self):
        """Channel k of the PFB ≈ shift(−f_k) → lowpass → decimate M of the
        same stream (within the filters' passband difference)."""
        import scipy.signal as sig

        m, fs = 8, 96000.0
        proto = pfb.design_prototype(m)
        rng = np.random.default_rng(1)
        # narrowband signal inside channel 2
        base = rng.standard_normal(2000) + 1j * rng.standard_normal(2000)
        lp = sig.firwin(101, 0.04)
        nb = sig.lfilter(lp, 1, np.repeat(base, 12))[: m * 2800]
        f2 = pfb.channel_frequencies(m, fs)[2]
        n = np.arange(len(nb))
        x = (nb * np.exp(2j * np.pi * f2 / fs * n)).astype(np.complex64)

        tail = pfb.channelizer_init(m, len(proto) // m)
        _, y = pfb.channelize(tail, proto, x, m)
        ch = np.asarray(y)[2]

        direct = x * np.exp(-2j * np.pi * f2 / fs * n)
        direct = sig.lfilter(np.asarray(proto, np.float64), 1, direct)[::m]

        # compare settled region; the stream delay may shift alignment by
        # ±1 channel sample — take the best small lag
        best = None
        for lag in (-2, -1, 0, 1, 2):
            a, b = ch[200:2500], direct[200:2500]
            if lag > 0:
                a, b = a[lag:], b[: len(a) - lag]
            elif lag < 0:
                b, a = b[-lag:], a[: len(b) + lag]
            n2 = min(len(a), len(b))
            err = np.abs(a[:n2] - b[:n2]).max()
            best = min(best, err) if best is not None else err
        assert best < 5e-2, f"PFB vs direct max err {best}"
