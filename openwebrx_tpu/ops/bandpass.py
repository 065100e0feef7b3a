"""Overlap-save FFT bandpass filtering.

Reference analog: ``pycsdr.modules.Bandpass(use_fft=True)`` with live
``setBandpass`` (reference ``csdr/chain/selector.py:115-117,166``; transition
320/outRate).  The frequency response is a *traced parameter* computed on
host by ``firdes.bandpass_response`` — dragging the passband edges updates
an array, never recompiles.

Streaming: classic overlap-save.  The carried state is the last (ntaps−1)
input samples; each block FFTs [tail | block] in segments of nfft,
multiplies by the response, IFFTs, and keeps the valid part.  For typical
audio-channel blocks one segment per block suffices (nfft = ntaps−1+B
rounded up), which is what the chain layer configures.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def plan_nfft(ntaps: int, block: int) -> int:
    """Smallest power of two ≥ ntaps − 1 + block (single-segment case)."""
    need = ntaps - 1 + block
    return 1 << int(np.ceil(np.log2(need)))


def bandpass_init(ntaps: int, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros(batch_shape + (ntaps - 1,), dtype=jnp.complex64)


def bandpass_apply(tail: jnp.ndarray, response: jnp.ndarray, x: jnp.ndarray,
                   ntaps: int, nfft: int):
    """tail (..., ntaps−1) · response (nfft,) complex64 · x (..., B).

    Requires ntaps − 1 + B ≤ nfft (single segment).  Returns (tail, y) with
    y (..., B) complex64 — same length as input: overlap-save 'full stream'
    filtering with a constant (ntaps−1)-sample group delay, exactly like the
    streaming time-domain convolution (verified in tests vs scipy).
    """
    import jax

    b = x.shape[-1]
    xe = jnp.concatenate([tail, x], axis=-1)          # (..., T−1+B)
    new_tail = xe[..., -(ntaps - 1):] if ntaps > 1 else tail
    pad = nfft - xe.shape[-1]
    xp = jnp.pad(xe, [(0, 0)] * (xe.ndim - 1) + [(0, pad)])
    # barrier: upstream convs (NCW layouts) can otherwise propagate a
    # non-major layout into the XLA:CPU FFT thunk, which RET_CHECKs on it
    xp = jax.lax.optimization_barrier(xp)
    xf = jnp.fft.fft(xp, axis=-1)
    yf = jax.lax.optimization_barrier(xf * response)
    y = jnp.fft.ifft(yf, axis=-1)
    # valid region: convolution outputs (ntaps−1) .. (ntaps−1+B)
    y = y[..., ntaps - 1: ntaps - 1 + b]
    return new_tail, y.astype(jnp.complex64)
