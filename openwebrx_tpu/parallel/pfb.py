"""Distributed polyphase channelizer: time-sharded fold + all_to_all.

The pod-scale wideband frontend (BASELINE config #5, SURVEY §2.6
transport mapping): each chip folds its own TIME SLICE of the wideband
block through the PFB (so ingest bandwidth scales with chips), the FIR
history crossing shard boundaries travels one hop over ICI via
``lax.ppermute`` (the overlap-save halo exchange), and one
``lax.all_to_all`` re-shards the result from time-sharded to
CHANNEL-sharded — exactly the layout the per-channel demod chains want.
Collectives ride ICI; nothing is replicated except the (tiny) carried
global tail.

    x (B,) time-sharded ─ fold+FFT per shard (halo from left neighbor)
      → Y_d (M, B/(n·M)) ─ all_to_all(split M, concat time)
      → Y (M/n per chip, B/M) channel-sharded → batched chains
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openwebrx_tpu.ops import channelizer as pfb


def sharded_channelize(mesh: Mesh, axis: str, prototype, m: int):
    """Returns fold(tail, x) usable inside jit: tail ((P·M,) complex,
    replicated) and x ((B,) complex, time-sharded) → (new_tail,
    channels (M, B/M) sharded on the channel axis)."""
    n = mesh.shape[axis]
    proto = jnp.asarray(prototype)
    halo = int(proto.shape[0])           # P·M carried samples

    def inner(tail, x_local):
        i = jax.lax.axis_index(axis)
        send = x_local[..., -halo:]
        # ring halo: my trailing P·M samples feed my right neighbor's fold
        prev = jax.lax.ppermute(send, axis,
                                [(d, (d + 1) % n) for d in range(n)])
        local_tail = jnp.where(i == 0, tail, prev)
        _, y = pfb.channelize(local_tail, proto, x_local, m)
        # the stream's new global tail is the LAST shard's trailing samples
        new_tail = jax.lax.psum(
            jnp.where(i == n - 1, send, jnp.zeros_like(send)), axis)
        # time-sharded (M, T/n) → channel-sharded (M/n, T)
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        return new_tail, y

    return jax.shard_map(inner, mesh=mesh,
                         in_specs=(P(), P(axis)),
                         out_specs=(P(), P(axis)),
                         check_vma=False)


def collective_probe(mesh: Mesh, axis: str, prototype, m: int, block: int):
    """A jitted step exercising EXACTLY the collectives of
    ``sharded_channelize`` (halo ppermute + tail psum + all_to_all
    re-shard) on same-shaped data, with the fold/FFT/chain compute
    removed.  Timing it against the full step decomposes a distributed
    step into compute vs transport — the scaling-efficiency evidence
    SCALING.json carries (per-step breakdown)."""
    n = mesh.shape[axis]
    halo = int(jnp.asarray(prototype).shape[0])
    t_total = block // m

    def inner(send, y):
        prev = jax.lax.ppermute(send, axis,
                                [(d, (d + 1) % n) for d in range(n)])
        i = jax.lax.axis_index(axis)
        tail = jax.lax.psum(
            jnp.where(i == n - 1, send, jnp.zeros_like(send)), axis)
        y2 = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1,
                                tiled=True)
        return ((prev + tail).sum() + y2.sum())[None]

    probe = jax.shard_map(inner, mesh=mesh, in_specs=(P(axis), P(axis)),
                          out_specs=P(axis), check_vma=False)
    jitted = jax.jit(lambda s, y: probe(s, y).sum())
    # global shapes, axis-0 sharded → per-shard (halo, 2) and
    # (m, B/(n·m), 2), exactly the production step's collective operands
    send_shape = (n * halo, 2)
    y_shape = (n * m, max(1, t_total // n), 2)
    return jitted, send_shape, y_shape


def reshard_probe(mesh: Mesh, axis: str, m: int, block: int):
    """The time→channel ``all_to_all`` re-shard ALONE, on the production
    step's operand shape — isolates the one collective that moves real
    payload (the halo ppermute carries P·M samples, the tail psum one
    vector; the all_to_all moves the whole channelized block).  SCALING
    .json records this next to the full-collective probe so the
    transport story decomposes further (VERDICT r4 item 6)."""
    n = mesh.shape[axis]
    t_total = block // m

    def inner(y):
        y2 = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=1,
                                tiled=True)
        return y2.sum()[None]

    probe = jax.shard_map(inner, mesh=mesh, in_specs=(P(axis),),
                          out_specs=P(axis), check_vma=False)
    jitted = jax.jit(lambda y: probe(y).sum())
    y_shape = (n * m, max(1, t_total // n), 2)
    return jitted, y_shape
