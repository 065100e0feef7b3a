"""Streaming FIR filtering / decimation as XLA convolutions (MXU path).

Reference analogs: ``pycsdr.modules.FirDecimate`` / ``Lowpass`` /
``FractionalDecimator`` (reference ``csdr/chain/selector.py:29``,
``csdr/chain/analog.py:66``).  The reference runs one C++ thread per filter
per listener; here filtering is ``lax.conv_general_dilated`` over a batch of
channels so XLA lowers it onto the MXU, and streaming continuity is an
explicit overlap tail carried between blocks (overlap-save).

Convention: true causal convolution from zero initial state — streaming
output sample m equals ``scipy.signal.lfilter(taps, 1, stream)[m·D]``
bit-identically, regardless of block boundaries (tests/test_ops_fir.py).

Complex data is carried as a trailing feature pair (re, im) through a 2×2
feature conv, which both avoids complex dtypes inside the conv and doubles
MXU utilization.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _as_batch(x: jnp.ndarray):
    """Flatten (..., W) to (N, W); return array and a restore fn."""
    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    return x.reshape(n, x.shape[-1]), lambda y: y.reshape(lead + y.shape[1:]) if lead else y[0]


def _conv_real(x: jnp.ndarray, h_flipped: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x (N, W) float32, h_flipped (T,) pre-reversed taps → (N, out) float32."""
    lhs = x[:, None, :]                       # (N, C=1, W)
    rhs = h_flipped[None, None, :]            # (O=1, I=1, T)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    return out[:, 0, :]


def _conv_complex(x: jnp.ndarray, h_flipped: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x (N, W) complex64, h_flipped (T,) complex or real pre-reversed taps."""
    lhs = jnp.stack([x.real, x.imag], axis=1)  # (N, 2, W)
    hr = jnp.real(h_flipped).astype(jnp.float32)
    hi = jnp.imag(h_flipped).astype(jnp.float32)
    # (yr, yi) = (xr*hr - xi*hi, xr*hi + xi*hr)
    rhs = jnp.stack([jnp.stack([hr, -hi]), jnp.stack([hi, hr])])  # (O=2, I=2, T)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.complex(out[:, 0, :], out[:, 1, :])


def fir_init(taps_len: int, batch_shape=(), complex_input: bool = True) -> jnp.ndarray:
    """Carried overlap tail: last (T−1) input samples, zeros at stream start."""
    dtype = jnp.complex64 if complex_input else jnp.float32
    return jnp.zeros(batch_shape + (taps_len - 1,), dtype=dtype)


def fir_apply(tail: jnp.ndarray, taps, x: jnp.ndarray, decimation: int = 1):
    """Streaming FIR (+ optional integer decimation).

    tail: (..., T−1) carried state
    taps: (T,) float32 or complex64 (design-time constant, NOT flipped)
    x:    (..., B) with B % decimation == 0
    returns (new_tail, y) with y (..., B // decimation)
    """
    taps = jnp.asarray(taps)
    t = taps.shape[-1]
    xe = jnp.concatenate([tail, x], axis=-1)
    new_tail = xe[..., -(t - 1):] if t > 1 else tail
    h_flipped = taps[::-1]
    xb, restore = _as_batch(xe)
    if jnp.iscomplexobj(xe):
        y = _conv_complex(xb, h_flipped, decimation)
    else:
        y = _conv_real(xb, h_flipped.real.astype(jnp.float32), decimation)
    return new_tail, restore(y)


def polyphase_bank(taps: np.ndarray, interpolation: int, decimation: int):
    """Precompute the phase-filter bank for rational resampling (host-side).

    Rational L/M resampling (y = downsample_M(h * upsample_L(x))) is
    restructured so that all L output phases read the input at the same
    stride-M positions: output group j produces y[j·L + r] for r in 0..L−1,
    with y[jL + r] = Σ_c H[r, c] x[jM + lo + c].  That makes the whole
    resampler ONE strided conv with L output features — no gathers.

    Derivation: y[m] = Σ_k h[k] u[mM − k] with u[iL] = x[i]; for m = jL + r
    the nonzero terms have k ≡ rM (mod L) at input index i = jM + (rM − k)/L.

    Returns (bank (L, P) float32, tail_len, delay_groups) where ``tail_len``
    is the carried-state length required for streamed outputs to sit exactly
    on the true output grid (chosen in [P−M, P−1] with (tail_len + lo) ≡ 0
    mod M), and ``delay_groups``·L is the whole-sample output delay of the
    stream relative to upfirdn of the same input.
    """
    taps = np.asarray(taps, np.float64)
    tlen = len(taps)
    lgd = interpolation
    rows = []
    for r in range(lgd):
        ks = np.arange(tlen)
        pos = r * decimation - ks  # upsampled-domain positions rM − k
        valid = (pos % interpolation == 0)
        in_idx = pos[valid] // interpolation  # input indices (mostly ≤ 0)
        rows.append((in_idx, taps[ks[valid]]))
    lo = min((idx.min() for idx, _ in rows if len(idx)), default=0)
    hi = max((idx.max() for idx, _ in rows if len(idx)), default=0)
    p = int(hi - lo + 1)
    bank = np.zeros((lgd, p), np.float64)
    for r, (in_idx, coefs) in enumerate(rows):
        bank[r, in_idx - lo] = coefs
    # ensure the window spans at least M inputs (left-pad with zero columns —
    # they map to older input indices with zero weight, harmless history)
    if p < decimation:
        pad = decimation - p
        bank = np.concatenate([np.zeros((lgd, pad)), bank], axis=1)
        lo -= pad
        p += pad
    # tail length: the unique t in [P−M, P−1] with (t + lo) ≡ 0 (mod M) —
    # exactly B/M conv output groups per block AND outputs on the true grid.
    t = p - decimation
    while (t + lo) % decimation != 0:
        t += 1
    delay_groups = (t + lo) // decimation
    return bank.astype(np.float32), int(t), int(delay_groups)


def resample_init(tail_len: int, batch_shape=(), complex_input: bool = False) -> jnp.ndarray:
    dtype = jnp.complex64 if complex_input else jnp.float32
    return jnp.zeros(batch_shape + (tail_len,), dtype=dtype)


def resample_apply(tail: jnp.ndarray, bank, x: jnp.ndarray,
                   interpolation: int, decimation: int):
    """Streaming rational resampler using a precomputed polyphase bank.

    tail: (..., tail_len) carried input samples (from polyphase_bank)
    bank: (L, P) float32 from polyphase_bank()
    x:    (..., B) with B % decimation == 0
    returns (new_tail, y) with y (..., B·L/M)
    """
    bank = jnp.asarray(bank)
    lgd, p = bank.shape
    tail_len = tail.shape[-1]
    xe = jnp.concatenate([tail, x], axis=-1)
    new_tail = xe[..., xe.shape[-1] - tail_len:] if tail_len > 0 else tail
    xb, restore = _as_batch(xe)
    if jnp.iscomplexobj(xe):
        lhs = jnp.stack([xb.real, xb.imag], axis=1)           # (N, 2, W)
        rhs = jnp.concatenate([
            jnp.stack([bank, jnp.zeros_like(bank)], axis=1),   # re rows
            jnp.stack([jnp.zeros_like(bank), bank], axis=1),   # im rows
        ])                                                     # (2L, 2, P)
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(decimation,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32,
        )
        yr, yi = out[:, :lgd, :], out[:, lgd:, :]
        y = jax.lax.complex(yr, yi)
    else:
        out = jax.lax.conv_general_dilated(
            xb[:, None, :], bank[:, None, :], window_strides=(decimation,),
            padding="VALID", dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32,
        )
        y = out
    # out: (N, L, B/M) — interleave phases: y[jL + r] = out[r, j]
    y = jnp.swapaxes(y, -1, -2).reshape(y.shape[0], -1)
    return new_tail, restore(y)
