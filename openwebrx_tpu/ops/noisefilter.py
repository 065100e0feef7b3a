"""Spectral noise reduction (audio NR).

Reference analog: ``pycsdr.modules.NoiseFilter`` (spectral-subtraction NR
with a threshold in dB, reference ``csdr/chain/clientaudio.py:14``).

STFT with 50%-overlap Hann analysis/synthesis.  The noise floor is the
low percentile of the magnitude spectrum per frame (noise is broadband;
a percentile across bins is robust to signal peaks), smoothed across
blocks with a carried EMA; per-bin gains are soft spectral subtraction
scaled by the threshold.  All frames of a block process as one batched
FFT; overlap-add is exact (hann² COLA correction applied).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

FRAME = 500        # window length: HOP=250 divides all standard audio rates
HOP = FRAME // 2
NFFT = 512         # zero-padded FFT size

_WIN = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(FRAME) / FRAME)).astype(np.float32)
# hann²-at-50%-overlap COLA envelope: w²[n] + w²[n+HOP] over one hop
_COLA = (_WIN[:HOP] ** 2 + _WIN[HOP:] ** 2)
_COLA_CORRECTION = (1.0 / np.maximum(_COLA, 1e-3)).astype(np.float32)


def nr_init(batch_shape=()):
    return (
        jnp.zeros(batch_shape + (HOP,), jnp.float32),      # input tail
        jnp.zeros(batch_shape + (HOP,), jnp.float32),      # overlap-add tail
        jnp.full(batch_shape, -1.0, jnp.float32),          # smoothed floor (−1 = unset)
    )


def nr_apply(state, threshold_db, x: jnp.ndarray):
    """x (..., B) float32 audio with B % HOP == 0 → same shape, denoised.

    threshold_db: traced scalar; higher = more aggressive subtraction.
    Output is delayed by one hop (streaming overlap-add latency).
    """
    in_tail, ola_tail, floor_ema = state
    b = x.shape[-1]
    nframes = b // HOP
    window = jnp.asarray(_WIN)

    xe = jnp.concatenate([in_tail, x], axis=-1)           # (..., HOP+B)
    idx = np.arange(nframes)[:, None] * HOP + np.arange(FRAME)[None, :]
    frames = jnp.take(xe, jnp.asarray(idx), axis=-1) * window
    spec = jnp.fft.rfft(frames, n=NFFT, axis=-1)          # (..., nframes, NFFT/2+1)
    mag = jnp.abs(spec)

    # broadband noise floor: low percentile across bins, averaged over the
    # block's frames, EMA-smoothed across blocks
    frame_floor = jnp.percentile(mag, 25.0, axis=-1).mean(axis=-1)  # (...,)
    floor = jnp.where(floor_ema < 0, frame_floor,
                      0.8 * floor_ema + 0.2 * frame_floor)

    alpha = 10.0 ** (jnp.asarray(threshold_db, jnp.float32) / 20.0)
    sub = alpha[..., None, None] * floor[..., None, None]
    gain = jnp.clip((mag - sub) / jnp.maximum(mag, 1e-9), 0.1, 1.0)
    cleaned = jnp.fft.irfft(spec * gain, n=NFFT, axis=-1)[..., :FRAME] * window

    first = cleaned[..., :, :HOP]
    second = cleaned[..., :, HOP:]
    prev_second = jnp.concatenate(
        [ola_tail[..., None, :], second[..., :-1, :]], axis=-2)
    y = (first + prev_second) * jnp.asarray(_COLA_CORRECTION)
    y = y.reshape(x.shape[:-1] + (b,))

    new_state = (xe[..., -HOP:], second[..., -1, :], floor.astype(jnp.float32))
    return new_state, y.astype(jnp.float32)
