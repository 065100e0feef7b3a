"""Pallas TPU kernel: the polyphase fold at the heart of the channelizer.

The PFB's branch filtering computes v[t, p] = Σ_j u[t+j, p] · B[j, p]
(P ≈ 16 taps, M ≈ 1024 phases, tens of thousands of t per block).  This
kernel DMAs an overlapping (T_TILE+P, M) window of u from HBM into VMEM
per grid step, unrolls the P-tap accumulation on the VPU, and writes
(T_TILE, M) output tiles — one pass over HBM for u and v.

Measured on a v5 lite chip at M=1024, P=16, 3.07 Ms blocks with
device-resident input, the depthwise-conv path in
``channelizer.channelize`` runs the whole PFB in ~50 µs (≈65 GS/s of
input) — HBM-bandwidth-bound and nowhere near the system bottleneck
(earlier numpy-input comparisons measured the dev tunnel's ~1.4 GB/s
H2D, not compute).  The conv path stays the default; this kernel is
kept as an alternative backend and a substrate for future fused
fold+twiddle experiments.

Caveat (axon): jitted programs that combine this pallas_call with large
additional XLA graphs in ONE jit can hang the remote compile service;
keep the pallas call in its own jit boundary (as `polyphase_fold` is).

Complex data is carried as separate re/im float32 planes (TPU-friendly;
the caller splits/joins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 256
_WINDOW_PAD = 24  # ≥ P−1 for P ≤ 25, multiple of 8 for clean VMEM tiling


def _fold_kernel(p_taps, u_re_hbm, u_im_hbm, bank_ref, v_re_ref, v_im_ref,
                 scratch_re, scratch_im, sems):
    t = pl.program_id(0)
    offset = pl.multiple_of(t * T_TILE, T_TILE)
    window = T_TILE + _WINDOW_PAD
    dma_re = pltpu.make_async_copy(
        u_re_hbm.at[pl.ds(offset, window), :], scratch_re, sems.at[0])
    dma_im = pltpu.make_async_copy(
        u_im_hbm.at[pl.ds(offset, window), :], scratch_im, sems.at[1])
    dma_re.start()
    dma_im.start()
    dma_re.wait()
    dma_im.wait()
    acc_re = jnp.zeros((T_TILE, scratch_re.shape[1]), jnp.float32)
    acc_im = jnp.zeros((T_TILE, scratch_im.shape[1]), jnp.float32)
    for j in range(p_taps):
        w = bank_ref[j, :]
        acc_re = acc_re + scratch_re[j: j + T_TILE, :] * w
        acc_im = acc_im + scratch_im[j: j + T_TILE, :] * w
    v_re_ref[:, :] = acc_re
    v_im_ref[:, :] = acc_im


@functools.partial(jax.jit, static_argnames=("p_taps", "interpret"))
def polyphase_fold(u: jnp.ndarray, bank_t: jnp.ndarray, p_taps: int,
                   interpret: bool = False):
    """u (n_time, M) complex64, bank_t (P, M) float32 (tap-major, already
    time-reversed) → v (n_time − P, M) complex64.

    n_time − P must be a multiple of T_TILE (callers plan blocks so).
    """
    n_time, m = u.shape
    assert p_taps <= _WINDOW_PAD + 1
    nout = n_time - p_taps + 1
    # pad the time axis so the tile grid covers nout exactly and every
    # tile's DMA window is in bounds; padded rows produce garbage outputs
    # that are sliced off below
    nout_padded = -(-nout // T_TILE) * T_TILE
    pad = nout_padded + _WINDOW_PAD - n_time
    if pad > 0:
        u = jnp.pad(u, ((0, pad), (0, 0)))
    grid = (nout_padded // T_TILE,)
    window = T_TILE + _WINDOW_PAD

    kernel = functools.partial(_fold_kernel, p_taps)
    v_re, v_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # u_re stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # u_im stays in HBM
            pl.BlockSpec((p_taps, m), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_TILE, m), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_TILE, m), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nout_padded, m), jnp.float32),
            jax.ShapeDtypeStruct((nout_padded, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((window, m), jnp.float32),
            pltpu.VMEM((window, m), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.real(u), jnp.imag(u), bank_t)
    return jax.lax.complex(v_re[:nout], v_im[:nout])
