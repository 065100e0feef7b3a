"""Multi-host distribution: jax.distributed init + host-sharded IQ ingest.

The reference moves IQ between processes over TCP and Unix pipes
(``owrx/source/__init__.py:310`` TcpSource, nmux ``owrx/source/direct.py:20``)
— one host, one stream, fan-out by copy.  The pod-scale TPU equivalent
(SURVEY §2.6 / §5.8, BASELINE config #5) distributes one wideband stream
across HOSTS:

- ``jax.distributed.initialize`` joins the processes into one cluster; the
  global mesh spans every chip of every host.
- Each host ingests ONLY its time slab of the wideband block (its own
  `native/iq_ingest` ring / file segment).  No host ever sees the full
  stream — ingest bandwidth scales with hosts.
- ``jax.make_array_from_process_local_data`` assembles the global
  time-sharded array without any host-side gather; the jitted step's halo
  exchange (``lax.ppermute``) and time→channel re-shard
  (``lax.all_to_all``) ride ICI/DCN as XLA collectives.
- Each host reads back only ITS channel shards (``addressable_shards``)
  and serves its own websocket listeners — audio fan-out also scales.

``DistributedReceiver`` wires a ChannelizedBank over the cluster;
``main()`` is the per-host dryrun entry used by ``__graft_entry__``'s
2-process virtual-cluster check and by ``tests/test_cluster.py``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np


@dataclass
class ClusterInfo:
    process_id: int
    num_processes: int
    local_device_count: int
    global_device_count: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0


def init_cluster(coordinator_address: str | None = None,
                 num_processes: int | None = None,
                 process_id: int | None = None,
                 timeout: int = 120) -> ClusterInfo:
    """Join this host to the receiver cluster (no-op for a 1-host config).

    Falls back to the OWRX_COORDINATOR / OWRX_NUM_PROCESSES /
    OWRX_PROCESS_ID environment (set by systemd template units or the
    container orchestrator) when arguments are omitted.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "OWRX_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("OWRX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("OWRX_PROCESS_ID", "0"))
    if num_processes > 1:
        if not coordinator_address:
            raise ValueError("multi-host config needs a coordinator address")
        if not jax.distributed.is_initialized():
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id,
                initialization_timeout=timeout)
    return ClusterInfo(process_id, num_processes,
                       len(jax.local_devices()), len(jax.devices()))


class DistributedReceiver:
    """A ChannelizedBank stepped over every chip of every host.

    Input: each host calls ``process_local`` with ITS slab — block /
    num_processes complex samples (host p holds samples
    [p·slab, (p+1)·slab) of the global block, in stream order).

    Output: ``(channels, audio)`` where ``channels`` are the channel
    indices this host owns and ``audio`` their demodulated blocks — the
    host-local slice of the channel-sharded result.
    """

    def __init__(self, bank, cluster: ClusterInfo | None = None,
                 axis: str = "chan", devices=None):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from openwebrx_tpu.parallel.pfb import sharded_channelize
        from openwebrx_tpu.runtime.chain import _pack_leaf, _unpack_leaf

        self.bank = bank
        self.cluster = cluster or ClusterInfo(
            0, 1, len(jax.local_devices()), len(jax.devices()))
        if devices is None:
            devices = jax.devices()
        self.n_devices = len(devices)
        if bank.m % self.n_devices or bank.block % self.n_devices:
            raise ValueError(
                f"m={bank.m} / block={bank.block} must divide over "
                f"{self.n_devices} devices")
        self.mesh = Mesh(np.array(devices), (axis,))
        self._sharded = NamedSharding(self.mesh, P(axis))
        self._repl = NamedSharding(self.mesh, P())
        self.slab = bank.block // self.cluster.num_processes

        def put(a):
            arr = jnp.asarray(a)
            if arr.ndim >= 1 and arr.shape[0] == bank.m:
                return jax.device_put(arr, self._sharded)
            return jax.device_put(arr, self._repl)

        self._put = put
        self.state = jax.tree.map(put, bank.state)
        fold = sharded_channelize(self.mesh, axis, bank.prototype, bank.m)
        chain, s_mask = bank.chain, bank._s_mask
        by_chan = self._sharded

        def step(pstate, params, px):
            tail, chain_state = jax.tree.map(_unpack_leaf, pstate, s_mask)
            x = _unpack_leaf(px, True)
            tail, channels = fold(tail, x)
            channels = jax.lax.with_sharding_constraint(channels, by_chan)
            chain_state, y, aux = chain.apply(chain_state, params, channels)
            audio = y[0] if isinstance(y, tuple) else y
            check = jnp.sum(jnp.abs(audio.astype(jnp.float32)))
            return (jax.tree.map(_pack_leaf, (tail, chain_state)),
                    jax.tree.map(_pack_leaf, y), check)

        self._step = jax.jit(step, donate_argnums=(0,))
        self._params = None

    def refresh_params(self):
        """Re-shard chain params after a retune (assign/release/bandpass).

        Params are cached between calls — re-sharding every block would
        cost a cross-host broadcast per step (measured 5× slowdown on the
        2-process bench)."""
        import jax
        # bank._params() pushes any dirty control arrays into the chain
        # before materializing (runtime/channelized.py deferred push)
        # dense banks here: the slot gather indices (params[0]) are unused
        _idx, chain_params = self.bank._params()
        self._params = jax.tree.map(self._put, chain_params)
        return self._params

    def _params_stale(self) -> bool:
        """Cheap per-block staleness check: the bank marks its dirty flag
        on every control change (assign/retune/squelch/bandpass), so the
        per-step cost is one attribute read instead of hashing four
        control arrays (round-5 host-work batching; the bank must not be
        dispatched directly while owned by a DistributedReceiver, or its
        _params() call would clear the flag without re-sharding)."""
        return self._params is None or self.bank._params_dirty

    def _assemble(self, x_local: np.ndarray):
        """Host slab ((slab,) complex64 or packed (slab, 2) float32) →
        global time-sharded device array ((block, 2) float32)."""
        import jax
        from openwebrx_tpu.runtime.chain import host_pack_complex
        if np.iscomplexobj(x_local):
            x_local = host_pack_complex(np.asarray(x_local))
        x_local = np.ascontiguousarray(x_local, np.float32)
        if x_local.shape != (self.slab, 2):
            raise ValueError(
                f"host slab must be ({self.slab}, 2), got {x_local.shape}")
        return jax.make_array_from_process_local_data(self._sharded, x_local)

    def dispatch_local(self, x_local: np.ndarray):
        """Launch one global step from this host's IQ slab without waiting
        for results; device→host copies of this host's channel shards start
        streaming immediately.  Pair with ``complete_local`` — the
        streaming loop runs them one block apart so host packing/readback
        overlaps device compute (the same one-deep software pipeline as
        DeviceRuntime._loop / ChannelizedBank.dispatch)."""
        import jax
        x = self._assemble(x_local)
        if self._params_stale():
            self.refresh_params()
        self.state, yp, check = self._step(self.state, self._params, x)
        audio = yp[0] if isinstance(yp, tuple) else yp
        for shard in audio.addressable_shards:
            try:
                shard.data.copy_to_host_async()
            except (AttributeError, RuntimeError):
                break
        return audio, check

    def complete_local(self, pending):
        """Materialize a ``dispatch_local`` result: (channel_indices,
        audio_local, checksum) for the channels this host owns."""
        audio, check = pending
        # shards sorted by row start: direct writes into one preallocated
        # output, no argsort/fancy-index pass (round-5 host-work batching)
        shards = sorted(audio.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        first = np.asarray(shards[0].data)
        nrows = sum(s.data.shape[0] for s in shards)
        rows = np.empty((nrows,) + first.shape[1:], first.dtype)
        idx = np.empty(nrows, np.int64)
        at = 0
        for s in shards:
            data = first if s is shards[0] else np.asarray(s.data)
            n = data.shape[0]
            rows[at:at + n] = data
            lo = s.index[0].start or 0
            idx[at:at + n] = np.arange(lo, lo + n)
            at += n
        return idx, rows, float(check)

    def process_local(self, x_local: np.ndarray):
        """Step the global program with this host's IQ slab; returns
        (channel_indices, audio_local, checksum) — audio for the channels
        this host owns (packed float32 if the chain output is complex)."""
        return self.complete_local(self.dispatch_local(x_local))

    def time_collectives(self, blocks: int = 16) -> float:
        """Per-step seconds of the step's COLLECTIVES alone (halo ppermute
        + tail psum + all_to_all re-shard on production shapes, compute
        stripped) — the transport half of the compute-vs-collective
        breakdown SCALING.json reports."""
        import time

        import jax
        from openwebrx_tpu.parallel.pfb import collective_probe

        probe, send_shape, y_shape = collective_probe(
            self.mesh, "chan", self.bank.prototype, self.bank.m,
            self.bank.block)
        send = jax.device_put(np.zeros(send_shape, np.float32),
                              self._sharded)
        y = jax.device_put(np.zeros(y_shape, np.float32), self._sharded)
        np.asarray(probe(send, y))                   # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(blocks):
            out = probe(send, y)
        np.asarray(out)
        return (time.perf_counter() - t0) / blocks

    def time_reshard(self, blocks: int = 16) -> float:
        """Per-step seconds of the time→channel ``all_to_all`` re-shard
        ALONE (the payload-moving collective; parallel/pfb.py
        reshard_probe) — recorded separately in SCALING.json."""
        import time

        import jax
        from openwebrx_tpu.parallel.pfb import reshard_probe

        probe, y_shape = reshard_probe(self.mesh, "chan",
                                       self.bank.m, self.bank.block)
        y = jax.device_put(np.zeros(y_shape, np.float32), self._sharded)
        np.asarray(probe(y))                         # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(blocks):
            out = probe(y)
        np.asarray(out)
        return (time.perf_counter() - t0) / blocks


def _dryrun(cluster: ClusterInfo, m: int = 8, seconds: float = 0.02,
            devices=None):
    """One deterministic step on tiny shapes; returns the checksum every
    process must agree on (and which matches the single-process run)."""
    from openwebrx_tpu.runtime.channelized import ChannelizedBank

    bank = ChannelizedBank(48000.0 * m, m, mode="usb", compression="none",
                           target_seconds=seconds)
    for k in range(m):
        bank.assign(float((k - m // 2) * 48000.0))
    rx = DistributedReceiver(bank, cluster, devices=devices)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(bank.block)
         + 1j * rng.standard_normal(bank.block)).astype(np.complex64) * 0.1
    p = cluster.process_id
    # several blocks: block 1 is all filter-warmup zeros (FIR group delay
    # exceeds a tiny block), which would make the cross-host checksum
    # equality vacuous — checksum a post-warmup block instead
    for _ in range(3):
        idx, audio, check = rx.process_local(x[p * rx.slab:(p + 1) * rx.slab])
    # each host owns its channel slab: m/num_processes channels
    assert len(idx) == m // cluster.num_processes, (len(idx), m)
    assert audio.shape[0] == len(idx)
    assert check != 0.0, "dryrun audio is silent — checksum is meaningless"
    return check, len(idx)


def _bench(cluster: ClusterInfo, m: int, blocks: int,
           seconds: float = 0.4):
    """Weak-scaling bench leg: every host feeds its slab of a bank with
    m total channels; returns (global samples/s, per-step seconds)."""
    import time

    import jax

    from openwebrx_tpu.runtime.channelized import ChannelizedBank

    bank = ChannelizedBank(48000.0 * m, m, mode="usb", compression="none",
                           target_seconds=seconds)
    for k in range(m):
        bank.assign(float((k - m // 2) * 48000.0))
    rx = DistributedReceiver(bank, cluster)
    rng = np.random.default_rng(cluster.process_id)
    slabs = [(rng.standard_normal(rx.slab) + 1j * rng.standard_normal(rx.slab)
              ).astype(np.complex64) * 0.1 for _ in range(4)]
    for i in range(2):                                   # warmup + compile
        rx.process_local(slabs[i % len(slabs)])
    # one-deep pipeline: dispatch block N while block N−1's channel shards
    # finish copying back — host packing/readback overlaps device compute,
    # the same structure the production streaming loops use
    t0 = time.perf_counter()
    pend = None
    for i in range(blocks):
        nxt = rx.dispatch_local(slabs[i % len(slabs)])
        if pend is not None:
            rx.complete_local(pend)
        pend = nxt
    rx.complete_local(pend)
    dt = time.perf_counter() - t0
    coll_s = rx.time_collectives(min(blocks, 12)) if \
        rx.n_devices > 1 or cluster.num_processes > 1 else 0.0
    return bank.block * blocks / dt, dt / blocks, coll_s


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="multi-host dryrun worker")
    parser.add_argument("--coordinator", default="127.0.0.1:9820")
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--channels", type=int, default=8)
    parser.add_argument("--bench-blocks", type=int, default=0,
                        help="run the weak-scaling bench for N blocks")
    parser.add_argument("--block-seconds", type=float, default=0.4,
                        help="bench block duration (bigger amortizes the "
                             "fixed per-step collective latency)")
    args = parser.parse_args(argv)
    cluster = init_cluster(args.coordinator, args.num_processes,
                           args.process_id)
    out = {"process_id": cluster.process_id,
           "num_processes": cluster.num_processes,
           "local_devices": cluster.local_device_count,
           "global_devices": cluster.global_device_count}
    if args.bench_blocks:
        sps, step_s, coll_s = _bench(cluster, args.channels,
                                     args.bench_blocks,
                                     seconds=args.block_seconds)
        out.update(samples_per_s=sps, step_seconds=step_s,
                   collective_seconds=coll_s, channels=args.channels)
    else:
        check, nchan = _dryrun(cluster, m=args.channels)
        out.update(owned_channels=nchan, checksum=check)
    print(json.dumps(out), flush=True)
    import jax
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
