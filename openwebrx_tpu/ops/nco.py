"""NCO frequency shift (complex mixer).

Reference analog: ``pycsdr.modules.Shift`` used by the per-channel tuner
(reference ``csdr/chain/selector.py:132-140``, rate = −offset/inputRate,
settable live).  Here the shift rate is a *traced parameter*: retunes update
a scalar in the param pytree and never recompile.  The phase ramp is
computed vectorially (no per-sample recurrence) with the accumulated phase
carried across blocks, and broadcasts over leading channel axes so a bank
of channels shifts in one op.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def shift_init(batch_shape=()) -> jnp.ndarray:
    """Initial carried phase (radians), one per channel."""
    return jnp.zeros(batch_shape, dtype=jnp.float32)


def shift_apply(phase: jnp.ndarray, rate, x: jnp.ndarray):
    """Mix x by exp(j·2π·rate·n) with carried phase.

    phase: (...,) float32 radians   — carried state
    rate:  scalar or (...,) float32 — normalized frequency (cycles/sample)
    x:     (..., B) complex64
    returns (new_phase, y)
    """
    b = x.shape[-1]
    rate = jnp.asarray(rate, jnp.float32)
    n = jnp.arange(b, dtype=jnp.float32)
    ph = phase[..., None] + TWO_PI * rate[..., None] * n
    # keep magnitudes small for float32 trig accuracy
    ph = jnp.mod(ph, TWO_PI)
    y = x * jnp.exp(1j * ph.astype(jnp.complex64))
    new_phase = jnp.mod(phase + TWO_PI * rate * b, TWO_PI)
    return new_phase, y
