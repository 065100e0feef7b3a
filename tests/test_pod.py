"""Pod-scale sharded channelized bank: parity with single-device run."""

import numpy as np
import pytest

from openwebrx_tpu.parallel.mesh import make_mesh
from openwebrx_tpu.parallel.pod import shard_channelized_bank
from openwebrx_tpu.runtime.channelized import ChannelizedBank


class TestPodSharding:
    def test_sharded_matches_unsharded(self):
        fs, m = 1.536e6, 16  # 16 × 96 kHz channels, shard 8 ways
        mesh = make_mesh(8, {"chan": 8})
        bank = ChannelizedBank(fs, m, mode="usb", compression="none",
                               target_seconds=0.04)
        offs = [150000.0, -400000.0]
        f_audio = [900.0, 1300.0]
        for o in offs:
            bank.assign(o)
        n = np.arange(bank.block * 3)
        x = sum(0.4 * np.exp(2j * np.pi * (o + fa) / fs * n)
                for o, fa in zip(offs, f_audio)).astype(np.complex64)

        # unsharded reference
        ref_out = []
        for blk in np.split(x, 3):
            y, _ = bank.process(blk)
            ref_out.append(np.asarray(y))
        ref = np.concatenate(ref_out, axis=-1)

        # sharded run from fresh state
        bank2 = ChannelizedBank(fs, m, mode="usb", compression="none",
                                target_seconds=0.04)
        for o in offs:
            bank2.assign(o)
        run, state = shard_channelized_bank(bank2, mesh)
        shard_out = []
        for blk in np.split(x, 3):
            state, y, aux = run(state, blk)
            shard_out.append(np.asarray(y))
        sharded = np.concatenate(shard_out, axis=-1)

        assert sharded.shape == ref.shape
        # parity on the signal-bearing channels (int16 rounding tolerance)
        for o in offs:
            k, _ = bank.channel_for(o)
            a = sharded[k].astype(np.float32) / 32767
            b = ref[k].astype(np.float32) / 32767
            n2 = len(a) // 3
            np.testing.assert_allclose(a[n2:], b[n2:], atol=2e-2)
