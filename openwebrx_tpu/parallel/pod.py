"""Pod-scale receiver: the ChannelizedBank sharded over a device mesh.

BASELINE config #5: wideband IQ → PFB → 1000+ channels across N chips.
Sharding layout (SURVEY §5.8):

- the IQ block is REPLICATED (every chip runs the full PFB — its cost is
  tiny next to the per-channel chains) or optionally time-sharded through
  the halo FIR frontend;
- the channelizer's channel axis and every per-channel state/param array
  are sharded over the mesh's "chan" axis, so each chip demodulates its
  frequency slab of channels;
- XLA partitions the single jitted step; the only collectives are the
  (small) gathers XLA inserts around the replicated input.

``shard_channelized_bank`` rewires an existing ChannelizedBank's state and
params onto a mesh and returns a step function — the same program, now
SPMD.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_channelized_bank(bank, mesh: Mesh, chan_axis: str = "chan"):
    """Returns (step, state) with state sharded channel-wise over the mesh.

    step(state, params, x) -> (state, y, aux); params are taken from
    bank.chain.params() each call and sharded on the fly (they are small).
    y's leading channel axis comes back sharded; np.asarray gathers it.
    """
    m = bank.m
    by_chan = NamedSharding(mesh, P(chan_axis))
    repl = NamedSharding(mesh, P())

    def put(a):
        arr = jnp.asarray(a)
        if arr.ndim >= 1 and arr.shape[0] == m:
            return jax.device_put(arr, by_chan)
        return jax.device_put(arr, repl)

    # bank.state leaves are packed float32 (complex can't cross the jit
    # boundary on tunnel backends — runtime/chain.py "complex boundary");
    # unpack inside the sharded step, repack on the way out
    from openwebrx_tpu.runtime.chain import (
        _pack_leaf, _unpack_leaf, host_pack_complex,
    )

    state = jax.tree.map(put, bank.state)
    chain = bank.chain
    proto = bank.prototype
    mm = bank.m
    s_mask = bank._s_mask

    from openwebrx_tpu.parallel.pfb import sharded_channelize

    # distributed frontend: each chip folds its time slice (halo over
    # ICI via ppermute), all_to_all re-shards to channel-sharded — the
    # wideband input is SHARDED, not replicated (parallel/pfb.py)
    fold = sharded_channelize(mesh, chan_axis, proto, mm)
    by_time = NamedSharding(mesh, P(chan_axis))

    def step(pstate, params, px):
        tail, chain_state = jax.tree.map(_unpack_leaf, pstate, s_mask)
        x = _unpack_leaf(px, True)
        tail, channels = fold(tail, x)
        channels = jax.lax.with_sharding_constraint(channels, by_chan)
        chain_state, y, aux = chain.apply(chain_state, params, channels)
        return (jax.tree.map(_pack_leaf, (tail, chain_state)),
                jax.tree.map(_pack_leaf, y), jax.tree.map(_pack_leaf, aux))

    stepj = jax.jit(step, donate_argnums=(0,))

    def run(state, x):
        # bank._params() pushes any dirty control arrays into the chain and
        # re-materializes only on change (runtime/channelized.py); pod
        # sharding layers over DENSE banks, so the slot gather indices
        # (params[0]) are unused here — chain params only
        _idx, chain_params = bank._params()
        params = jax.tree.map(put, chain_params)
        import numpy as _np
        if _np.iscomplexobj(x):
            x = host_pack_complex(_np.asarray(x))
        x = jax.device_put(jnp.asarray(x), by_time)
        return stepj(state, params, x)

    return run, state
