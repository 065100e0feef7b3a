"""Power squelch with hang, plus s-meter power reports.

Reference analog: ``pycsdr.modules.Squelch`` wired by the Selector
(reference ``csdr/chain/selector.py:104-130``: 16 power measurements/s, 4
reports/s, hang, flush on close; power side-writer feeds the client
s-meter).  Here the block is split into measurement windows, a tiny scan
carries the open/hang state across windows, the gate multiplies the signal,
and the per-window power (dB) is returned as an auxiliary output the host
decimates to the report rate.

The squelch *level* is a traced parameter (slider moves never recompile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squelch_init(batch_shape=()):
    return (jnp.zeros(batch_shape, jnp.bool_),   # gate open
            jnp.zeros(batch_shape, jnp.int32))   # hang counter (windows)


def squelch_apply(state, level_db, x: jnp.ndarray, window: int, hang_windows: int = 2):
    """x (..., B) complex64/float32, B % window == 0.

    level_db: traced scalar/(...,) threshold in dB (−150 ⇒ squelch off,
    matching the reference UI convention of a fully-open slider).
    returns (state, gated, power_db) with power_db (..., nwindows).
    """
    open_, hang = state
    b = x.shape[-1]
    nw = b // window
    p = (jnp.abs(x) ** 2).reshape(x.shape[:-1] + (nw, window)).mean(axis=-1)
    power_db = 10.0 * jnp.log10(jnp.maximum(p, 1e-30))
    above = power_db > jnp.asarray(level_db, jnp.float32)[..., None]
    above_t = jnp.moveaxis(above, -1, 0)  # (nw, ...)

    def step(carry, a):
        o, h = carry
        h_new = jnp.where(a, hang_windows, jnp.maximum(h - 1, 0))
        o_new = a | (h_new > 0)
        return (o_new, h_new), o_new

    (open_, hang), gates = jax.lax.scan(step, (open_, hang), above_t)
    gates = jnp.moveaxis(gates, 0, -1)                    # (..., nw)
    g = jnp.repeat(gates, window, axis=-1)
    # where (not multiply): x·0 keeps the sign of zero, and −0.0 downstream
    # turns arctan2(0, −0) = π into full-scale FM noise
    y = jnp.where(g, x, jnp.zeros((), x.dtype))
    return (open_, hang), y, power_db
