"""Symbol timing recovery, TPU-style (feedforward, no feedback loop).

Reference analog: ``pycsdr.modules.TimingRecovery`` (reference
``csdr/chain/digimodes.py:76``) — a per-sample Gardner feedback loop in
C++.  Feedback loops are TPU-hostile (sequential, block-boundary state
hand-off); instead this uses square-law feedforward estimation
(Oerder-Meyr style): the transition energy m[n] = |x[n]−x[n−1]|² has a
spectral line at the symbol rate whose PHASE locates the transitions, so
one complex correlation per block yields the timing offset — fully
vectorized over the block AND over channels.

Digimode chains bring any baud rate to SPS=4 samples/symbol first
(rational resampler); digital-voice chains run at their native
samples-per-symbol (10 for 4800 baud at 48 kHz, 20 for 2400 baud), so
``sps`` is a parameter with SPS=4 as the digimode default.  Symbol
centers are offset + k·sps with offset ∈ [0, sps) estimated per block
and kept continuous across blocks via the carried previous offset
(symbol count per block is exactly B/sps — static shapes, no validity
bookkeeping).
"""

from __future__ import annotations

import jax.numpy as jnp

SPS = 4  # digimode default samples per symbol after the chains' resampling


def timing_init(batch_shape=(), sps: int = SPS):
    tail = 2 * sps
    return (jnp.full(batch_shape, -1e9, jnp.float32),         # prev offset
            jnp.zeros(batch_shape + (tail,), jnp.complex64))  # trailing samples


def recover(state, x: jnp.ndarray, sps: int = SPS):
    """x (..., B) complex at ``sps`` samples/symbol, B % sps == 0
    → (state, symbols (..., B/sps) complex).

    Symbols are the linearly-interpolated samples at the estimated symbol
    centers; one symbol per sps input samples, always.
    """
    prev_off, tail = state
    tail_len = 2 * sps
    b = x.shape[-1]
    n_sym = b // sps
    xe = jnp.concatenate([tail, x], axis=-1)          # (..., TAIL+B)
    new_tail = xe[..., -tail_len:]

    # transition energy and its symbol-rate phase
    d = xe[..., 1:] - xe[..., :-1]
    m = (d.real**2 + d.imag**2)
    n = jnp.arange(m.shape[-1], dtype=jnp.float32) - (tail_len - 1)
    rot = jnp.exp(-2j * jnp.pi * n / sps).astype(jnp.complex64)
    c = jnp.sum(m.astype(jnp.complex64) * rot, axis=-1)
    # transition position (mod sps); impulses at n ≡ t₀ contribute
    # exp(-2πi·t₀/sps), so the position is the NEGATED phase — symbol
    # centers sit half a symbol after the transition
    trans = -jnp.angle(c) / (2 * jnp.pi) * sps
    offset = jnp.mod(trans + sps / 2.0, sps)

    # continuity: snap to the representation nearest the previous offset
    # (prevents ±1-symbol slips when the estimate straddles the wrap), then
    # smooth — per-block estimator jitter would otherwise wobble the
    # sampling instant by ±1 sample near transitions
    have_prev = prev_off > -1e8
    k = jnp.round((prev_off - offset) / sps)
    snapped = offset + k * sps
    smoothed = 0.75 * prev_off + 0.25 * snapped
    offset = jnp.where(have_prev, jnp.clip(smoothed, -sps / 2, 1.5 * sps), offset)

    # sample at centers: xe index TAIL + offset + j·sps  (j = 0..n_sym−1);
    # offset already includes the half-symbol advance past the transition
    base = float(tail_len)
    pos = base + offset[..., None] + jnp.arange(n_sym, dtype=jnp.float32) * sps
    total = xe.shape[-1]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, total - 2)
    frac = (pos - i0.astype(jnp.float32)).astype(jnp.complex64)
    a = jnp.take_along_axis(xe, i0, axis=-1)
    bnext = jnp.take_along_axis(xe, i0 + 1, axis=-1)
    symbols = a + (bnext - a) * frac
    return (offset.astype(jnp.float32), new_tail), symbols
