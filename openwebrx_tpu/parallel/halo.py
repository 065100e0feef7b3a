"""Halo-exchange streaming FIR over a time-sharded IQ block.

The wideband frontend for pod scale (BASELINE config #5): a block of IQ is
split into contiguous time shards across the mesh axis; each chip filters
its shard, but a causal FIR needs the (ntaps−1) samples preceding the
shard.  Those come from the LEFT neighbor via ``jax.lax.ppermute`` (the
carried cross-BLOCK state covers shard 0).  This is the direct structural
analog of ring-attention neighbor passing for convolutional state
(SURVEY §5.7) — the reference has no equivalent; its transport is ring
buffers on one host (§2.6).

All functions are written for use inside ``shard_map`` over a mesh axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openwebrx_tpu.ops import fir


def _halo_left(local: jnp.ndarray, halo: int, carried_tail: jnp.ndarray,
               axis_name: str) -> jnp.ndarray:
    """Prepend each shard with the last `halo` samples of its left neighbor
    (ring ppermute); shard 0 gets the carried cross-block tail instead."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    edge = local[..., -halo:]
    # send right: shard i → shard i+1 (shard 0 receives shard n−1's edge,
    # which it must ignore in favor of the carried tail)
    recv = jax.lax.ppermute(edge, axis_name,
                            [(i, (i + 1) % n) for i in range(n)])
    left = jnp.where(idx == 0, carried_tail, recv)
    return jnp.concatenate([left, local], axis=-1)


def halo_fir_decimate(tail: jnp.ndarray, taps, x_local: jnp.ndarray,
                      decimation: int, axis_name: str):
    """Streaming FIR+decimate on one shard of a time-sharded block.

    tail:    (..., T−1) carried state of the WHOLE stream (same value on
             every shard; only shard 0 consumes it, the new value is the
             global last T−1 samples — broadcast from the last shard)
    x_local: (..., B/n) this shard's contiguous time slice
    returns (new_tail, y_local (..., B/(n·D)))

    Output identical to single-chip fir.fir_apply on the whole block
    (tests/test_parallel.py), with each shard's slice B/n divisible by D.
    """
    taps = jnp.asarray(taps)
    t = taps.shape[-1]
    n = jax.lax.axis_size(axis_name)
    xe = _halo_left(x_local, t - 1, tail, axis_name)
    h_flipped = taps[::-1]
    xb, restore = fir._as_batch(xe)
    if jnp.iscomplexobj(xe):
        y = fir._conv_complex(xb, h_flipped, decimation)
    else:
        y = fir._conv_real(xb, h_flipped.real.astype(jnp.float32), decimation)
    y = restore(y)
    # new global tail = last T−1 samples of the LAST shard, replicated to
    # all shards (tiny all_gather of the halo region)
    edge = x_local[..., -(t - 1):] if t > 1 else x_local[..., :0]
    gathered = jax.lax.all_gather(edge, axis_name, axis=0)  # (n, ..., T−1)
    return gathered[n - 1], y


def make_sharded_decimator(mesh, axis_name: str, taps, decimation: int,
                           batch_spec=P()):
    """Build a jitted (tail, x) → (tail, y) step where x is time-sharded
    over `axis_name` and the FIR halos ride ppermute.  x must have its last
    axis divisible by (mesh_size · decimation)."""
    in_time = P(*batch_spec, axis_name)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), in_time), out_specs=(P(), in_time),
             check_vma=False)
    def step(tail, x_local):
        return halo_fir_decimate(tail, taps, x_local, decimation, axis_name)

    return jax.jit(step)
