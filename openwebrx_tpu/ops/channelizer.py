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
    (wrap k ≥ M/2 to negative frequencies).

    Channel k is EXACTLY shift(−k·fs/M) → prototype → decimate M
    (phase-exact vs scipy in tests).  The textbook commutator feeds branch
    p with z_p[t] = x[tM − p] — a REVERSED stride through each frame,
    which on TPU forced a lane-reversal + 1-wide concatenate + transpose
    that cost more than the conv and FFT combined (3.9 of 5.9 ms at
    M=1024, B=2.46 Ms).  Instead we keep the data in its natural order
    with the phase-reversal identity: with u'[t, q] = x[(t−1)M + 1 + q]
    (a contiguous slice + reshape) and phase-reversed filters
    h'_q = h_{M−1−q}, the branch outputs satisfy v[t, p] = v'[t, M−1−p],
    and the channel DFT Σ_p e^{+j2πkp/M} v[t, p] becomes
    e^{−j2πk/M} · FFT_q(v'[t, q])[k] — the reversal collapses into a
    constant per-channel twiddle.  Everything is contiguous: one slice,
    one reshape, a depthwise conv in time-major NWC layout (M lanes =
    8 sublanes × 128 lanes exactly at M≥128), a last-axis FFT, one
    transpose."""
    h = jnp.asarray(prototype)
    p = h.shape[0] // m
    xe = jnp.concatenate([tail, x], axis=-1)
    new_tail = xe[..., -(p * m):]
    nf = xe.shape[-1] // m
    # u'[t, q] = x[tM + 1 + q] for t = 0..nf−2 — contiguous
    up = jax.lax.dynamic_slice_in_dim(
        xe, 1, (nf - 1) * m, axis=-1).reshape(nf - 1, m)
    # phase-reversed filters, time-reversed taps for the conv
    bank2 = h.reshape(p, m)[::-1, ::-1]                    # (P, M) host const
    lhs = jnp.stack([up.real, up.imag], axis=0)            # (2, T, M) NWC
    rhs = bank2[:, None, :]                                # (P, 1, M) depthwise
    v = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=m,
        preferred_element_type=jnp.float32,
    )                                                      # (2, B/M, M)
    vc = jax.lax.complex(v[0], v[1])
    yk = jnp.fft.fft(vc, axis=-1)                          # contiguous FFT
    tw = jnp.exp(-2j * np.pi * jnp.arange(m) / m).astype(jnp.complex64)
    return new_tail, (yk * tw).T.astype(jnp.complex64)


def channel_frequencies(m: int, fs: float) -> np.ndarray:
    """Center frequency of each channel index (wrapped to ±fs/2)."""
    k = np.arange(m)
    f = k * fs / m
    f[f >= fs / 2] -= fs
    return f
