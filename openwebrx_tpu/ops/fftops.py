"""Waterfall FFT pipeline: windowed FFT → log power → averaging → fftshift.

Reference analog: ``pycsdr.modules.Fft`` / ``LogPower`` / ``LogAveragePower``
/ ``FftSwap`` composed by reference ``csdr/chain/fft.py:5-96`` (fps/overlap →
averages/blocksize math at :75-85).  One call produces every waterfall row
of an input block as a batch — frames × fft_size is a single batched rFFT
the TPU eats whole.  Frame extraction uses static reshapes (chains pick
block sizes divisible by the frame stride), never gathers.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hann_window(size: int) -> np.ndarray:
    return np.hanning(size).astype(np.float32)


def hamming_window(size: int) -> np.ndarray:
    return np.hamming(size).astype(np.float32)


def fft_init(fft_size: int, every_n: int, batch_shape=()) -> jnp.ndarray:
    """Carried raw samples preceding the block (overlap when every_n < size,
    zeros at start).  Length fft_size − min(fft_size, every_n) ≥ 0... we carry
    a fixed fft_size-sample history for simplicity."""
    return jnp.zeros(batch_shape + (fft_size,), dtype=jnp.complex64)


def fft_power_at(history: jnp.ndarray, window, x: jnp.ndarray,
                 fft_size: int, ends: np.ndarray):
    """|FFT|² frames ending at the given block offsets (host-static array).

    history: (..., fft_size) carried samples preceding the block
    ends:    (nframes,) int offsets in (0, B] — frame k covers stream
             samples [ends[k]−fft_size, ends[k]) of the extended block
    returns (new_history, power (..., nframes, fft_size))

    Decouples waterfall framing from chain block-size constraints: ANY
    block size works with a fixed frames-per-block (the in-block frame
    spacing is uniform; across-block spacing jitters by <1 frame, invisible
    on a waterfall).
    """
    ends = np.asarray(ends)
    idx = ends[:, None] + np.arange(fft_size)[None, :]  # xe coords
    xe = jnp.concatenate([history, x], axis=-1)
    frames = jnp.take(xe, jnp.asarray(idx), axis=-1)
    new_history = xe[..., -fft_size:]
    spec = jnp.fft.fft(frames * window, axis=-1)
    return new_history, spec.real**2 + spec.imag**2


def fft_power(history: jnp.ndarray, window, x: jnp.ndarray,
              fft_size: int, every_n: int):
    """Compute frames of |FFT|² in dB over a block.

    history: (..., fft_size) carried samples (the fft_size samples preceding
             this block)
    window:  (fft_size,) float32
    x:       (..., B) complex64 with B % every_n == 0
    returns (new_history, power_db (..., nframes, fft_size)) — NOT yet
    averaged/shifted; see log_average / fft_swap.

    Frame k covers samples [k·every_n − fft_size, k·every_n) of the
    extended stream — i.e. each frame is the fft_size samples *ending* at
    multiples of every_n, so frames are causal and stream-continuous.
    """
    b = x.shape[-1]
    nframes = b // every_n
    xe = jnp.concatenate([history, x], axis=-1)  # (..., fft_size + B)
    if every_n == fft_size:
        frames = xe[..., fft_size:].reshape(x.shape[:-1] + (nframes, fft_size))
    else:
        # static strided windows via as_strided-style reshape trick:
        # build index grid host-side (static) and use take
        idx = (np.arange(nframes)[:, None] * every_n +
               np.arange(fft_size)[None, :])  # frame k starts at k*every_n
        if every_n > fft_size:
            idx += every_n - fft_size  # align frame end to (k+1)*every_n
        frames = jnp.take(xe, jnp.asarray(idx), axis=-1)
    new_history = xe[..., -fft_size:]
    spec = jnp.fft.fft(frames * window, axis=-1)
    p = spec.real**2 + spec.imag**2
    return new_history, p


def log_average(p: jnp.ndarray, averages: int, add_db: float = -70.0,
                fft_size: int | None = None) -> jnp.ndarray:
    """Average groups of `averages` frames then convert to dB.

    Reference: LogAveragePower(add_db=−70, avgs) (csdr/chain/fft.py:18-22).
    p (..., nframes, fft_size) → (..., nframes//averages, fft_size) float32.
    Normalized by fft_size so levels are size-independent.
    """
    nf = p.shape[-2]
    navg = nf // averages
    size = p.shape[-1] if fft_size is None else fft_size
    p = p[..., : navg * averages, :].reshape(p.shape[:-2] + (navg, averages, p.shape[-1]))
    pm = p.mean(axis=-2) / (size * size)
    return (10.0 * jnp.log10(jnp.maximum(pm, 1e-30)) + add_db).astype(jnp.float32)


def fft_swap(rows: jnp.ndarray) -> jnp.ndarray:
    """fftshift for display (reference FftSwap, csdr/chain/fft.py:36)."""
    return jnp.fft.fftshift(rows, axes=-1)


def waterfall_params(sample_rate: float, fft_size: int, fps: float,
                     overlap_factor: float = 0.3):
    """Reference math (csdr/chain/fft.py:75-85): choose every_n and averages
    so the client sees `fps` rows/s, averaging when frames are abundant."""
    frames_per_s = sample_rate / fft_size
    if frames_per_s > fps:
        averages = max(1, int(round(frames_per_s / fps)))
        every_n = fft_size
    else:
        averages = 1
        every_n = max(1, int(round(sample_rate / fps)))
    return int(every_n), int(averages)
