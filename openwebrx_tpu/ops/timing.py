"""Symbol timing recovery, TPU-style (feedforward, no feedback loop).

Reference analog: ``pycsdr.modules.TimingRecovery`` (reference
``csdr/chain/digimodes.py:76``) — a per-sample Gardner feedback loop in
C++.  Feedback loops are TPU-hostile (sequential, block-boundary state
hand-off); instead this uses square-law feedforward estimation
(Oerder-Meyr style): the transition energy m[n] = |x[n]−x[n−1]|² has a
spectral line at the symbol rate whose PHASE locates the transitions, so
one complex correlation per block yields the timing offset — fully
vectorized over the block AND over channels.

Chains bring any baud rate to SPS=4 samples/symbol first (rational
resampler), so symbol centers are offset + k·SPS with offset ∈ [0, SPS)
estimated per block and kept continuous across blocks via the carried
previous offset (symbol count per block is exactly B/SPS — static shapes,
no validity bookkeeping).
"""

from __future__ import annotations

import jax.numpy as jnp

SPS = 4  # fixed samples per symbol after the chains' resampling

_TAIL = 2 * SPS


def timing_init(batch_shape=()):
    return (jnp.full(batch_shape, -1e9, jnp.float32),          # prev offset
            jnp.zeros(batch_shape + (_TAIL,), jnp.complex64))  # trailing samples


def recover(state, x: jnp.ndarray):
    """x (..., B) complex at SPS samples/symbol, B % SPS == 0
    → (state, symbols (..., B/SPS) complex).

    Symbols are the linearly-interpolated samples at the estimated symbol
    centers; one symbol per SPS input samples, always.
    """
    prev_off, tail = state
    b = x.shape[-1]
    n_sym = b // SPS
    xe = jnp.concatenate([tail, x], axis=-1)          # (..., TAIL+B)
    new_tail = xe[..., -_TAIL:]

    # transition energy and its symbol-rate phase
    d = xe[..., 1:] - xe[..., :-1]
    m = (d.real**2 + d.imag**2)
    n = jnp.arange(m.shape[-1], dtype=jnp.float32) - (_TAIL - 1)
    rot = jnp.exp(-2j * jnp.pi * n / SPS).astype(jnp.complex64)
    c = jnp.sum(m.astype(jnp.complex64) * rot, axis=-1)
    # transition position (mod SPS); symbol centers half a symbol later
    trans = jnp.angle(c) / (2 * jnp.pi) * SPS
    offset = jnp.mod(trans + SPS / 2.0, SPS)

    # continuity: snap to the representation nearest the previous offset
    # (prevents ±1-symbol slips when the estimate straddles the wrap), then
    # smooth — per-block estimator jitter would otherwise wobble the
    # sampling instant by ±1 sample near transitions
    have_prev = prev_off > -1e8
    k = jnp.round((prev_off - offset) / SPS)
    snapped = offset + k * SPS
    smoothed = 0.75 * prev_off + 0.25 * snapped
    offset = jnp.where(have_prev, jnp.clip(smoothed, -SPS / 2, 1.5 * SPS), offset)

    # sample at centers: xe index TAIL + offset + j·SPS  (j = 0..n_sym−1)
    base = _TAIL - SPS / 2.0  # center the first symbol window in-block
    pos = base + offset[..., None] + jnp.arange(n_sym, dtype=jnp.float32) * SPS
    total = xe.shape[-1]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, total - 2)
    frac = (pos - i0.astype(jnp.float32)).astype(jnp.complex64)
    a = jnp.take_along_axis(xe, i0, axis=-1)
    bnext = jnp.take_along_axis(xe, i0 + 1, axis=-1)
    symbols = a + (bnext - a) * frac
    return (offset.astype(jnp.float32), new_tail), symbols
