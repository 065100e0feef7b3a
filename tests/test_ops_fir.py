"""FIR / resampler kernels vs scipy golden references, plus streaming
consistency (block-by-block == whole-stream)."""

import numpy as np
import pytest
import scipy.signal as sig

from openwebrx_tpu.ops import fir, firdes


def _stream(apply_fn, init, x, nblocks):
    """Run apply_fn over nblocks equal blocks, concatenate outputs."""
    state = init
    outs = []
    for blk in np.split(x, nblocks):
        state, y = apply_fn(state, blk)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


class TestFirDecimate:
    @pytest.mark.parametrize("decim", [1, 4, 10])
    def test_matches_scipy_real(self, decim):
        rng = np.random.default_rng(0)
        taps = firdes.lowpass_taps(0.4 / max(decim, 2), 0.05)
        x = rng.standard_normal(4000).astype(np.float32)
        tail = fir.fir_init(len(taps), complex_input=False)
        _, y = fir.fir_apply(tail, taps, x, decim)
        # zero-filled initial tail ⇒ causal filtering from zero state:
        # out[m] = lfilter(taps, 1, x)[m*D]
        golden = sig.lfilter(taps, [1.0], x)[::decim]
        np.testing.assert_allclose(np.asarray(y), golden, rtol=1e-4, atol=1e-5)

    def test_streaming_equals_batch(self):
        rng = np.random.default_rng(1)
        taps = firdes.lowpass_taps(0.1, 0.02)
        x = (rng.standard_normal(8000) + 1j * rng.standard_normal(8000)).astype(np.complex64)
        decim = 5

        whole_tail = fir.fir_init(len(taps))
        _, y_whole = fir.fir_apply(whole_tail, taps, x, decim)

        y_stream = _stream(lambda s, b: fir.fir_apply(s, taps, b, decim),
                           fir.fir_init(len(taps)), x, 8)
        np.testing.assert_allclose(y_stream, np.asarray(y_whole), rtol=1e-4, atol=1e-5)

    def test_batch_channels(self):
        rng = np.random.default_rng(2)
        taps = firdes.lowpass_taps(0.1, 0.05)
        x = (rng.standard_normal((3, 1000)) + 1j * rng.standard_normal((3, 1000))).astype(np.complex64)
        tail = fir.fir_init(len(taps), batch_shape=(3,))
        _, y = fir.fir_apply(tail, taps, x, 2)
        for c in range(3):
            _, yc = fir.fir_apply(fir.fir_init(len(taps)), taps, x[c], 2)
            np.testing.assert_allclose(np.asarray(y[c]), np.asarray(yc), rtol=1e-4, atol=1e-5)


class TestFractionalResampler:
    @pytest.mark.parametrize("lm", [(2, 3), (3, 2), (15, 16), (24, 125)])
    def test_matches_scipy_upfirdn(self, lm):
        interp, decim = lm
        rng = np.random.default_rng(3)
        cut = 0.45 / max(interp, decim)
        taps = firdes.lowpass_taps(cut, cut * 0.5) * interp
        bank, tail_len, delay_groups = fir.polyphase_bank(taps, interp, decim)
        x = rng.standard_normal(decim * 1600).astype(np.float32)  # B % M == 0

        tail = fir.resample_init(tail_len, complex_input=False)
        _, y = fir.resample_apply(tail, bank, x, interp, decim)
        y = np.asarray(y)
        assert y.shape[-1] == x.shape[-1] * interp // decim

        golden = sig.upfirdn(taps, x, up=interp, down=decim)
        d = delay_groups * interp  # whole-sample output delay of the stream
        n = len(y) - d
        np.testing.assert_allclose(y[d:], golden[:n], rtol=1e-4, atol=1e-4)
        if d:
            np.testing.assert_allclose(y[:d], 0, atol=1e-6)

    def test_streaming_equals_batch(self):
        interp, decim = 15, 16
        taps = firdes.lowpass_taps(0.028, 0.01) * interp
        bank, tail_len, _ = fir.polyphase_bank(taps, interp, decim)
        rng = np.random.default_rng(4)
        x = (rng.standard_normal(6400) + 1j * rng.standard_normal(6400)).astype(np.complex64)
        _, y_whole = fir.resample_apply(fir.resample_init(tail_len, complex_input=True),
                                        bank, x, interp, decim)
        y_stream = _stream(lambda s, b: fir.resample_apply(s, bank, b, interp, decim),
                           fir.resample_init(tail_len, complex_input=True), x, 4)
        np.testing.assert_allclose(y_stream, np.asarray(y_whole), rtol=1e-4, atol=1e-5)
