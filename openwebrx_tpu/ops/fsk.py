"""FSK symbol slicing for digital-voice modes.

Reference analog: digiham's ``FskDemodulator``/``GfskDemodulator`` — C
modules that take the FM discriminator output and emit one dibit per
symbol (DMR/YSF/D-Star/NXDN are 4FSK at 4800 or 2400 baud).  Here the
symbol-rate samples come from the feedforward timing recovery
(``ops/timing.py``); slicing is a vectorized threshold compare.

Level convention (ETSI TS 102 361-1 §10, C4FM): the four frequency
deviations ±3d, ±d map to dibits

    +3d → 0b01,  +d → 0b00,  −d → 0b10,  −3d → 0b11

i.e. the MSB is the sign, the LSB marks the outer levels.  The unit
level is estimated per block from the mean magnitude (E|y| = 2d for
equiprobable levels), so the slicer self-scales to the discriminator
gain — no deviation calibration needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def fsk4_slice(y: jnp.ndarray, floor: float = 1e-6) -> jnp.ndarray:
    """y (..., N) real symbol-rate samples → dibits (..., N) uint8.

    Adaptive: the inner/outer decision threshold is 2·d with
    d = mean(|y|)/2 estimated over the block's symbols per channel.
    """
    d = jnp.maximum(jnp.mean(jnp.abs(y), axis=-1, keepdims=True) / 2.0, floor)
    negative = y < 0
    outer = jnp.abs(y) > 2.0 * d
    dibits = jnp.where(negative, 2, 0) + jnp.where(outer, 1, 0)
    return dibits.astype(jnp.uint8)


def fsk2_slice(y: jnp.ndarray) -> jnp.ndarray:
    """Binary FSK: sign bit per symbol (..., N) uint8."""
    return (y > 0).astype(jnp.uint8)
