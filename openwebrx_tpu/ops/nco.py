"""NCO frequency shift (complex mixer) with exact fixed-point phase.

Reference analog: ``pycsdr.modules.Shift`` used by the per-channel tuner
(reference ``csdr/chain/selector.py:132-140``, rate = −offset/inputRate,
settable live).  The shift rate is a *traced parameter*: retunes update a
scalar in the param pytree and never recompile.

Numerics: phase is carried as a 32-bit fixed-point integer (cycles·2³²).
Integer adds/multiplies wrap mod 2³², which IS phase arithmetic mod one
cycle — so the phase ramp and the carried phase are exact for arbitrarily
long streams.  A float32 phase accumulator drifts ~0.02 rad per 100 ms
block at MHz rates (float32 ULP of 2π·rate·n at n≈2·10⁵ is huge), which is
audible as parity loss against a float64 reference; the fixed-point path
has zero drift and quantizes frequency to 2⁻³²·fs (≈ 0.0006 Hz at
2.4 MS/s).  The host computes the fixed-point rate from float64
(``rate_to_fixed``), so traced-param precision is not limited to float32.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TWO_PI = 2.0 * np.pi
_SCALE = 2.0 ** 32


def rate_to_fixed(rate) -> np.ndarray:
    """Host-side: normalized rate (cycles/sample, float64) → int32 fixed.

    Accepts scalars or arrays (per-channel banks).  Keeps full float64
    precision of the requested frequency: quantization is 2⁻³² cycles/sample.
    """
    f = np.mod(np.asarray(rate, np.float64), 1.0)
    fixed = np.int64(np.round(f * _SCALE)) & np.int64(0xFFFFFFFF)
    return fixed.astype(np.uint32).view(np.int32)


def shift_init(batch_shape=()) -> jnp.ndarray:
    """Initial carried phase (fixed-point cycles·2³²), one per channel."""
    return jnp.zeros(batch_shape, dtype=jnp.int32)


def _as_fixed(rate) -> jnp.ndarray:
    """Accept float rates (converted in-graph, float32 precision — test/ad-hoc
    convenience) or int32 fixed-point (exact host-converted param)."""
    rate = jnp.asarray(rate)
    if jnp.issubdtype(rate.dtype, jnp.integer):
        return rate.astype(jnp.int32)
    f = jnp.mod(rate.astype(jnp.float64) if rate.dtype == jnp.float64
                else rate.astype(jnp.float32), 1.0)
    # split into high/low halves so the float→fixed conversion keeps all
    # 32 bits (a single f·2³² cast saturates int32)
    hi = jnp.floor(f * jnp.float32(65536.0))
    lo = jnp.round((f * jnp.float32(65536.0) - hi) * jnp.float32(65536.0))
    return (hi.astype(jnp.int32) << 16) + lo.astype(jnp.int32)


def _expj_fixed(ph: jnp.ndarray) -> jnp.ndarray:
    """Fixed-point phase (cycles·2³²) → unit phasor (complex64)."""
    angle = (TWO_PI * (ph.astype(jnp.float32) * jnp.float32(2.0 ** -32))
             ).astype(jnp.float32)
    return jax_expj(angle)


def _chunk_size(b: int, want: int = 64) -> int:
    """Largest divisor of b not above `want`."""
    k = min(want, b)
    while b % k:
        k -= 1
    return k


def shift_apply(phase: jnp.ndarray, rate, x: jnp.ndarray):
    """Mix x by exp(j·2π·rate·n) with carried phase.

    phase: (...,) int32 fixed-point cycles — carried state
    rate:  scalar or (...,) int32 fixed-point (see rate_to_fixed) or float
    x:     (..., B) complex64
    returns (new_phase, y)

    The phasor builds by ROTATION COMPOSITION instead of per-sample
    transcendentals: sincos only at the B/K chunk-start phases and the K
    within-chunk offsets, with the full ramp their complex outer product
    (expj(a)·expj(b) ≡ expj(a+b) — exact rotation algebra, float32
    roundoff ~1e-7).  Per-sample sincos was the single hottest op of the
    1024-channel bank step (1.9 of 6 ms measured round 4); this cuts the
    transcendental count ≈ B/(√B·2) ≈ 24× at B=2400.  All phase indices
    stay exact int32 fixed-point (wrap ≡ mod one cycle), so carried-phase
    exactness is unchanged."""
    b = x.shape[-1]
    rf = _as_fixed(rate)
    k = _chunk_size(b)
    nb = b // k
    # chunk-start phases and within-chunk offsets, both exact fixed-point
    starts = phase[..., None] + (jnp.arange(nb, dtype=jnp.int32)
                                 * jnp.int32(k)) * rf[..., None]
    inner = jnp.arange(k, dtype=jnp.int32) * rf[..., None]
    phasor = (_expj_fixed(starts)[..., :, None]
              * _expj_fixed(inner)[..., None, :]
              ).reshape(*starts.shape[:-1], b)
    y = x * phasor                        # broadcasts over channel dims
    new_phase = phase + jnp.int32(b) * rf              # exact mod 2³²
    return new_phase, y


def jax_expj(angle: jnp.ndarray) -> jnp.ndarray:
    """exp(j·angle) for float32 angle in [−π, π] (complex64)."""
    return jnp.cos(angle) + 1j * jnp.sin(angle)
