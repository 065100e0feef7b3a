"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the three sharding modes (SURVEY §5.8 / parallel/__init__.py):
halo-exchange time sharding, channel sharding of the demod bank, and
streaming consistency across blocks.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from openwebrx_tpu.ops import fir, firdes
from openwebrx_tpu.parallel.mesh import make_mesh
from openwebrx_tpu.parallel.halo import make_sharded_decimator


class TestHaloFir:
    def test_matches_single_chip(self):
        mesh = make_mesh(8, {"time": 8})
        taps = firdes.lowpass_taps(0.04, 0.01)
        decim = 10
        rng = np.random.default_rng(0)
        b = 8 * decim * 100
        x = (rng.standard_normal(b) + 1j * rng.standard_normal(b)).astype(np.complex64)

        step = make_sharded_decimator(mesh, "time", taps, decim)
        tail = fir.fir_init(len(taps))
        x_sharded = jax.device_put(x, NamedSharding(mesh, P("time")))
        tail_s = jax.device_put(tail, NamedSharding(mesh, P()))
        new_tail, y = step(tail_s, x_sharded)

        ref_tail, y_ref = fir.fir_apply(fir.fir_init(len(taps)), taps, x, decim)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_tail), np.asarray(ref_tail),
                                   rtol=1e-5, atol=1e-6)

    def test_streaming_across_blocks(self):
        mesh = make_mesh(4, {"time": 4})
        taps = firdes.lowpass_taps(0.1, 0.02)
        decim = 4
        rng = np.random.default_rng(1)
        b = 4 * decim * 50
        x = (rng.standard_normal(3 * b) + 1j * rng.standard_normal(3 * b)).astype(np.complex64)

        step = make_sharded_decimator(mesh, "time", taps, decim)
        tail = jax.device_put(fir.fir_init(len(taps)), NamedSharding(mesh, P()))
        outs = []
        for blk in np.split(x, 3):
            blk_s = jax.device_put(blk, NamedSharding(mesh, P("time")))
            tail, y = step(tail, blk_s)
            outs.append(np.asarray(y))
        y_stream = np.concatenate(outs)
        _, y_ref = fir.fir_apply(fir.fir_init(len(taps)), taps, x, decim)
        np.testing.assert_allclose(y_stream, np.asarray(y_ref), rtol=1e-4, atol=1e-5)


class TestChannelSharding:
    def test_bank_sharded_over_channels(self):
        """The ChannelBank step partitioned over a channel mesh axis:
        per-channel state/params sharded, IQ replicated — XLA partitions the
        whole chain program with no code changes."""
        from openwebrx_tpu.runtime.bank import ChannelBank

        mesh = make_mesh(8, {"chan": 8})
        bank = ChannelBank(2.4e6, mode="nfm", capacity=8, compression="none",
                           target_seconds=0.05)
        offsets = np.linspace(-1e6, 1e6, 8).astype(np.float32)
        offsets[0] = 145000.0  # channel 0 carries the test tone
        for off in offsets:
            bank.add_channel(float(off))

        shard = lambda tree, spec: jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(mesh, spec)) if hasattr(a, "ndim") and a.ndim >= 1 else a,
            tree)
        # state leaves lead with the channel axis.  bank.program.state is
        # the PACKED float32 form (runtime/chain.py "complex boundary") —
        # chain.apply wants the unpacked pytree, which the CPU backend can
        # create eagerly
        state_sharded = shard(bank.chain.init_state((bank.capacity,)),
                              P("chan"))
        from tests.test_chains import make_nfm_signal
        x = make_nfm_signal(2.4e6, bank.block / 2.4e6, 145000.0)[: bank.block]

        chain = bank.chain
        step = jax.jit(lambda s, p, xx: chain.apply(s, p, xx))
        state2, y, aux = step(state_sharded, chain.params(), jnp.asarray(x))
        assert np.asarray(y).shape[0] == 8
        # the partitioned result matches the unsharded bank on the
        # signal-bearing channel (no-signal channels are AGC-amplified
        # noise floor, where fp reduction order under partitioning diverges)
        y_ref, _ = bank.process(x)
        a = np.asarray(y)[0].astype(np.float32) / 32767
        b = np.asarray(y_ref)[0].astype(np.float32) / 32767
        n2 = len(a) // 2  # settled half (AGC attack transient diverges in lsb)
        np.testing.assert_allclose(a[n2:], b[n2:], atol=5e-3)
