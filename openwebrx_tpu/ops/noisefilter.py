"""Spectral noise reduction (audio NR).

Reference analog: ``pycsdr.modules.NoiseFilter`` (spectral-subtraction NR
with a threshold in dB, reference ``csdr/chain/clientaudio.py:14``).

STFT with 50%-overlap Hann analysis/synthesis.  The noise floor is the
low percentile of the magnitude spectrum per frame (noise is broadband;
a percentile across bins is robust to signal peaks), smoothed across
blocks with a carried EMA; per-bin gains are soft spectral subtraction
scaled by the threshold.  All frames of a block process as one batched
FFT; overlap-add is exact (hann² COLA correction applied).

The hop is a plan-time parameter: the stage picks the divisor of its
planned block closest to ~5 ms of audio (``models/stages.py``
``best_chunk``), so the NR never constrains the chain's block LCM.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

DEFAULT_HOP = 250      # ~5 ms at 48 kHz — plan() picks the nearest divisor


def _plan(hop: int):
    """window, COLA correction and FFT size for a 2·hop Hann frame."""
    frame = 2 * hop
    nfft = 1 << max(9, int(np.ceil(np.log2(frame))))
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
           ).astype(np.float32)
    cola = win[:hop] ** 2 + win[hop:] ** 2
    corr = (1.0 / np.maximum(cola, 1e-3)).astype(np.float32)
    return win, corr, nfft


def nr_init(batch_shape=(), hop: int = DEFAULT_HOP):
    return (
        jnp.zeros(batch_shape + (hop,), jnp.float32),      # input tail
        jnp.zeros(batch_shape + (hop,), jnp.float32),      # overlap-add tail
        jnp.full(batch_shape, -1.0, jnp.float32),          # smoothed floor (−1 = unset)
    )


def nr_apply(state, threshold_db, x: jnp.ndarray, hop: int = DEFAULT_HOP):
    """x (..., B) float32 audio with B % hop == 0 → same shape, denoised.

    threshold_db: traced scalar; higher = more aggressive subtraction.
    Output is delayed by one hop (streaming overlap-add latency).
    """
    win_np, corr_np, nfft = _plan(hop)
    frame = 2 * hop
    in_tail, ola_tail, floor_ema = state
    b = x.shape[-1]
    nframes = b // hop
    window = jnp.asarray(win_np)

    xe = jnp.concatenate([in_tail, x], axis=-1)           # (..., hop+B)
    idx = np.arange(nframes)[:, None] * hop + np.arange(frame)[None, :]
    frames = jnp.take(xe, jnp.asarray(idx), axis=-1) * window
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)          # (..., nframes, nfft/2+1)
    mag = jnp.abs(spec)

    # broadband noise floor: low percentile across bins, averaged over the
    # block's frames, EMA-smoothed across blocks
    frame_floor = jnp.percentile(mag, 25.0, axis=-1).mean(axis=-1)  # (...,)
    floor = jnp.where(floor_ema < 0, frame_floor,
                      0.8 * floor_ema + 0.2 * frame_floor)

    alpha = 10.0 ** (jnp.asarray(threshold_db, jnp.float32) / 20.0)
    sub = alpha[..., None, None] * floor[..., None, None]
    gain = jnp.clip((mag - sub) / jnp.maximum(mag, 1e-9), 0.1, 1.0)
    cleaned = jnp.fft.irfft(spec * gain, n=nfft, axis=-1)[..., :frame] * window

    first = cleaned[..., :, :hop]
    second = cleaned[..., :, hop:]
    prev_second = jnp.concatenate(
        [ola_tail[..., None, :], second[..., :-1, :]], axis=-2)
    y = (first + prev_second) * jnp.asarray(corr_np)
    y = y.reshape(x.shape[:-1] + (b,))

    new_state = (xe[..., -hop:], second[..., -1, :], floor.astype(jnp.float32))
    return new_state, y.astype(jnp.float32)
