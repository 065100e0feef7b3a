"""Analog demodulators: AM envelope, quadrature FM, SSB real-part, sync AM.

Reference analogs: ``pycsdr.modules.AmDemod`` / ``FmDemod`` / ``RealPart`` /
``Afc`` wired by reference ``csdr/chain/analog.py:11-182``.  All ops act on
the last axis and broadcast over channel axes.  The only carried state is
one trailing sample (FM discriminator) or an estimated carrier phase
increment (sync AM), so channel banks demodulate as one fused elementwise
program that XLA folds into the surrounding kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from openwebrx_tpu.ops.iir import linear_recurrence


def am_demod(x: jnp.ndarray) -> jnp.ndarray:
    """Envelope detector: |x|.  (DC block + AGC are separate stages.)"""
    return jnp.abs(x).astype(jnp.float32)


def fm_init(batch_shape=()) -> jnp.ndarray:
    """Carried previous sample for the discriminator."""
    return jnp.zeros(batch_shape, dtype=jnp.complex64)


def fm_demod(prev: jnp.ndarray, x: jnp.ndarray):
    """Quadrature discriminator: arg(x[n]·conj(x[n−1])) / π ∈ [−1, 1].

    At the deviation limit (±fs/2 instantaneous frequency) output hits ±1,
    matching the float scaling conventions of the reference chain (audio in
    [−1, 1] before AGC/limit).
    """
    xs = jnp.concatenate([prev[..., None], x[..., :-1]], axis=-1)
    d = x * jnp.conj(xs)
    y = jnp.arctan2(d.imag, d.real) * (1.0 / jnp.pi)
    # guard the zero vector: arctan2(±0, −0) = ±π would turn squelched
    # silence into full-scale output
    y = jnp.where(d.real**2 + d.imag**2 > 0, y, 0.0)
    return x[..., -1], y.astype(jnp.float32)


def real_part(x: jnp.ndarray) -> jnp.ndarray:
    """SSB product detector after passband shift (reference RealPart,
    csdr/chain/analog.py:125): the Selector's complex bandpass has already
    isolated one sideband centered at baseband; Re{x} is the audio."""
    return x.real.astype(jnp.float32)


def limit(x: jnp.ndarray, max_amplitude: float = 1.0) -> jnp.ndarray:
    """Hard clipper (reference Limit, csdr/chain/analog.py:60)."""
    return jnp.clip(x, -max_amplitude, max_amplitude)


def gain(x: jnp.ndarray, g) -> jnp.ndarray:
    return x * g


# ---------------------------------------------------------------- sync AM --
def sync_am_init(batch_shape=()):
    """State for the synchronous AM detector: carrier phase + smoothed freq."""
    return (jnp.zeros(batch_shape, jnp.float32),   # phase (rad)
            jnp.zeros(batch_shape, jnp.float32))   # freq estimate (rad/sample)


def sync_am_demod(state, x: jnp.ndarray, loop_alpha: float = 0.5):
    """Block-wise carrier-locked AM (reference Afc + AmDemod, 'SAm' mode).

    Instead of a per-sample PLL (sequential, TPU-hostile), each block
    estimates the residual carrier from the mean phasor rotation
    (arg Σ x[n+1]·conj(x[n])), advances a smoothed frequency estimate, mixes
    the carrier down coherently and takes the real part.  Lock dynamics are
    block-rate (~10 Hz for 100 ms blocks), adequate for broadcast-carrier
    drift which is what SAM exists for.
    """
    phase, freq = state
    b = x.shape[-1]
    rot = jnp.sum(x[..., 1:] * jnp.conj(x[..., :-1]), axis=-1)
    inst_freq = jnp.arctan2(rot.imag, rot.real)
    freq = (1.0 - loop_alpha) * freq + loop_alpha * inst_freq
    n = jnp.arange(b, dtype=jnp.float32)
    ph = phase[..., None] + freq[..., None] * n
    bb = x * jnp.exp(-1j * ph.astype(jnp.complex64))
    # snap residual phase so the carrier lands on the real axis
    carrier = jnp.mean(bb, axis=-1)
    corr = jnp.arctan2(carrier.imag, carrier.real)
    bb = bb * jnp.exp(-1j * corr[..., None].astype(jnp.complex64))
    y = bb.real.astype(jnp.float32)
    new_phase = jnp.mod(phase + freq * b + corr, 2.0 * jnp.pi)
    return (new_phase, freq), y
