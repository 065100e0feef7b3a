"""First-order IIR sections as log-depth associative scans.

The reference's stateful one-pole filters (``pycsdr.modules.DcBlock``,
``NfmDeemphasis``, ``WfmDeemphasis`` — reference ``csdr/chain/analog.py:18,43,67``)
are per-sample recurrences in C++.  On TPU a linear recurrence
y[n] = a·y[n−1] + c[n] is evaluated in O(log B) depth with
``jax.lax.associative_scan`` — fully parallel across the block and across
channels, no sequential loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def linear_recurrence(a, c: jnp.ndarray, y_prev: jnp.ndarray) -> jnp.ndarray:
    """Solve y[n] = a·y[n−1] + c[n] along the last axis, y[−1] = y_prev.

    a: scalar or (...,) broadcastable coefficient
    c: (..., B) input
    y_prev: (...,) carried state
    """
    a = jnp.broadcast_to(jnp.asarray(a, c.dtype), c.shape)
    c = c.at[..., 0].add(a[..., 0] * y_prev)
    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br
    _, y = jax.lax.associative_scan(combine, (a, c), axis=-1)
    return y


def first_order_init(batch_shape=(), dtype=jnp.float32):
    """State (x_prev, y_prev) for a biquad-lite y = b0·x + b1·x⁻¹ + a1·y⁻¹.

    Distinct buffers — Program donates state, and aliased leaves would be
    donated twice."""
    return jnp.zeros(batch_shape, dtype), jnp.zeros(batch_shape, dtype)


def first_order_apply(state, b0, b1, a1, x: jnp.ndarray):
    """General first-order section along the last axis (streaming)."""
    x_prev, y_prev = state
    x_shift = jnp.concatenate([x_prev[..., None], x[..., :-1]], axis=-1)
    c = b0 * x + b1 * x_shift
    y = linear_recurrence(a1, c, y_prev)
    return (x[..., -1], y[..., -1]), y


def dc_block_coeffs(rate: float, cutoff_hz: float = 10.0):
    """y[n] = x[n] − x[n−1] + R·y[n−1]: single-pole DC blocker.

    Reference analog: pycsdr DcBlock (csdr/chain/analog.py:18).
    """
    r = float(np.exp(-2.0 * np.pi * cutoff_hz / rate))
    return 1.0, -1.0, r


def deemphasis_coeffs(rate: float, tau: float):
    """One-pole de-emphasis y[n] = α·x[n] + (1−α)·y[n−1].

    Reference analog: NfmDeemphasis/WfmDeemphasis with tau (e.g. 50e-6 EU /
    75e-6 US; csdr/chain/analog.py:43,67 and DeemphasisTauChain,
    csdr/chain/demodulator.py).
    """
    dt = 1.0 / rate
    alpha = dt / (tau + dt)
    return alpha, 0.0, 1.0 - alpha
