"""Polyphase filterbank channelizer: M channels from one wideband stream.

This replaces the reference's greedy resampler-tree for background services
(reference ``owrx/service/__init__.py:199-252`` groups nearby dial
frequencies under shared Resampler branches to save CPU) — on TPU one
critically-sampled PFB produces ALL M channels for the cost of one
prototype filter + an FFT (SURVEY §2.6: "polyphase channelizer makes this
obsolete"), and it is the scaling engine for the ≥1000-channel target
(BASELINE configs #3/#5).

Structure: prototype lowpass h (length M·P), phase decomposition
h_p[j] = h[jM + p]; branch p filters the decimated phase stream
x_p[n] = x[nM + p]; an M-point FFT across branches separates channels:

    Y[k, n] = Σ_p e^{+j2πkp/M} · (h_p * x_p)[n]    (channel k at +k·fs/M)

On TPU the branch filtering is ONE depthwise conv (feature_group_count=M)
and the channel FFT is a single batched FFT — both MXU/VPU friendly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from openwebrx_tpu.ops import firdes


def design_prototype(m: int, taps_per_phase: int = 16,
                     cutoff_scale: float = 1.0) -> np.ndarray:
    """Prototype lowpass for an M-channel critically-sampled PFB.

    cutoff 0.5/M (half the channel spacing) with transition sized so the
    total length is m·taps_per_phase.
    """
    n = m * taps_per_phase
    cutoff = 0.5 / m * cutoff_scale
    h = np.sinc(2 * cutoff * (np.arange(n) - (n - 1) / 2)) * 2 * cutoff
    h *= np.hamming(n)
    h /= h.sum()
    return h.astype(np.float32)


def channelizer_init(m: int, taps_per_phase: int, batch_shape=()) -> jnp.ndarray:
    """Carried tail: P·M input samples (P−1 filter frames + 1 commutator
    frame)."""
    return jnp.zeros(batch_shape + (taps_per_phase * m,), jnp.complex64)


def channelize(tail: jnp.ndarray, prototype, x: jnp.ndarray, m: int):
    """tail ((P−1)·M,) · prototype (M·P,) · x (B,) with B % M == 0
    → (new_tail, Y (M, B/M) complex64), channel k centered at k·fs/M
    (wrap k ≥ M/2 to negative frequencies)."""
    h = jnp.asarray(prototype)
    p = h.shape[0] // m
    xe = jnp.concatenate([tail, x], axis=-1)
    new_tail = xe[..., -(p * m):]
    nf = xe.shape[-1] // m
    # commutator: branch p consumes z_p[t] = x[tM − p], built uniformly from
    # the current frame (p=0) and the PREVIOUS frame reversed (p≥1) — this
    # makes channel k EXACTLY shift(−k·fs/M) → prototype → decimate M
    # (phase-exact vs scipy in tests)
    frames = xe.reshape(nf, m)
    u0 = frames[1:, :1]                      # (nf−1, 1): x[(t+1)M]
    up = frames[:-1, :0:-1]                  # (nf−1, M−1): x[tM+M−p], p=1..M−1
    u = jnp.concatenate([u0, up], axis=1).T  # (M, nf−1)
    # phase filters h_p[j] = h[jM + p], time-reversed for the conv
    bank = h.reshape(p, m).T[:, ::-1]                      # (M, P)
    lhs = jnp.stack([u.real, u.imag], axis=0)              # (2, M, nf−1)
    rhs = bank[:, None, :]                                 # (M, 1, P) depthwise
    v = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=m,
        preferred_element_type=jnp.float32,
    )                                                      # (2, M, B/M)
    vc = jax.lax.complex(v[0], v[1])
    # Σ_p e^{+j2πkp/M} v_p peaks at k = k0 for a tone at +k0·fs/M — the
    # inverse DFT (×M to undo ifft's 1/M)
    y = jnp.fft.ifft(vc, axis=0) * m
    return new_tail, y.astype(jnp.complex64)


def channel_frequencies(m: int, fs: float) -> np.ndarray:
    """Center frequency of each channel index (wrapped to ±fs/2)."""
    k = np.arange(m)
    f = k * fs / m
    f[f >= fs / 2] -= fs
    return f
