"""Automatic gain control, chunked for TPU.

Reference analog: ``pycsdr.modules.Agc`` with FAST/SLOW profiles
(reference ``csdr/chain/analog.py:13-15``, ``owrx/dsp.py:15``
``AgcProfile``).  The reference AGC is a per-sample nonlinear recurrence;
here the envelope is reduced per fixed-size chunk (peak), the gain follows
attack/decay dynamics with hang via a short ``lax.scan`` over chunks
(B/chunk ≈ 100–300 steps, vectorized over all channels), and the per-chunk
gain is linearly interpolated back to sample rate.  Dynamics are chunk-rate
(~1 ms), well inside the reference's FAST profile attack time.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AgcProfile:
    """Attack/decay per chunk, hang in chunks. Static (part of program)."""
    attack: float       # gain-down smoothing factor per chunk (fast)
    decay: float        # gain-up smoothing factor per chunk (slow)
    hang_chunks: int    # chunks to hold gain after a peak before decaying
    reference: float = 0.8     # target envelope level
    max_gain: float = 65536.0
    initial_gain: float = 1.0


# chunk = 50 samples ⇒ at 12 kHz audio: attack ≈ few ms, decay ≈ 100s of ms.
# 50 divides the 1/16-s squelch windows at all standard rates, keeping
# chain block sizes small (see models.stages.plan_block_size).
FAST = AgcProfile(attack=0.9, decay=0.01, hang_chunks=8)
SLOW = AgcProfile(attack=0.7, decay=0.002, hang_chunks=30)

CHUNK = 50


def agc_init(profile: AgcProfile, batch_shape=()):
    return (jnp.full(batch_shape, profile.initial_gain, jnp.float32),  # gain
            jnp.zeros(batch_shape, jnp.int32))                         # hang counter


def agc_apply(state, profile: AgcProfile, x: jnp.ndarray,
              chunk: int = CHUNK):
    """x (..., B) float32 (or complex64), B % chunk == 0 → same shape out.

    ``chunk`` is a plan-time soft cadence (AgcStage picks the divisor of
    its block nearest CHUNK=50), so the AGC never constrains the block LCM."""
    gain, hang = state
    b = x.shape[-1]
    nchunks = b // chunk
    env = jnp.abs(x).reshape(x.shape[:-1] + (nchunks, chunk)).max(axis=-1)
    env = jnp.moveaxis(env, -1, 0)  # (nchunks, ...) scan over time

    def step(carry, peak):
        g, h = carry
        target = profile.reference / jnp.maximum(peak, 1e-9)
        # attack: output would clip → move gain down fast, arm hang
        attacking = target < g
        g_att = g + profile.attack * (target - g)
        g_dec = g + profile.decay * (target - g)
        h_new = jnp.where(attacking, profile.hang_chunks, jnp.maximum(h - 1, 0))
        g_new = jnp.where(attacking, g_att, jnp.where(h > 0, g, g_dec))
        g_new = jnp.clip(g_new, 1e-6, profile.max_gain)
        return (g_new, h_new), g_new

    (gain, hang), gains = jax.lax.scan(step, (gain, hang), env)
    gains = jnp.moveaxis(gains, 0, -1)  # (..., nchunks)
    # interpolate gain chunk→sample (hold-with-ramp to avoid zipper noise)
    g_prev = jnp.concatenate([state[0][..., None], gains[..., :-1]], axis=-1)
    ramp = jnp.arange(chunk, dtype=jnp.float32) / chunk
    g_samp = g_prev[..., :, None] + (gains - g_prev)[..., :, None] * ramp
    g_samp = g_samp.reshape(x.shape[:-1] + (b,))
    return (gain, hang), (x * g_samp).astype(x.dtype)
