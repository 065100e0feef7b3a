"""Fanout: several chains over one input block fused into ONE program
(runtime/chain.py) — one dispatch and one fused result transfer per block
regardless of how many chains a device runs."""

import numpy as np
import pytest

from openwebrx_tpu.models.receiver import ClientDemodulatorChain, FftChain
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Fanout, Program


FS = 240000.0


def make_fanout():
    a = ClientDemodulatorChain(FS, 12000.0, "usb", compression="none")
    b = ClientDemodulatorChain(FS, 12000.0, "am", compression="none")
    fft = FftChain(1024, fps=1000.0, compress=False)
    return a, b, fft, Fanout(
        [("usb", a), ("am", b), ("fft", fft)],
        batch_shapes={"usb": (4,), "am": (2,), "fft": ()})


class TestFanout:
    def test_branches_keyed_and_batched(self):
        a, b, fft, fan = make_fanout()
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        prog = Program(fan, spec, 24000)
        x = (np.random.default_rng(0).standard_normal(24000)
             + 1j * np.random.default_rng(1).standard_normal(24000)
             ).astype(np.complex64) * 0.2
        y, aux = prog.process(x)
        assert set(y) == {"usb", "am", "fft"}
        assert np.asarray(y["usb"]).shape[0] == 4      # per-branch batch
        assert np.asarray(y["am"]).shape[0] == 2
        assert np.asarray(y["fft"]).ndim >= 1          # waterfall rows
        # aux keys are branch-prefixed
        assert any(k.startswith("usb.") for k in aux)
        assert any(k.startswith("am.") for k in aux)

    def test_branch_outputs_match_standalone(self):
        """A branch inside a Fanout must produce the same audio as the
        same chain compiled alone (fusion is an execution detail)."""
        rng = np.random.default_rng(2)
        x = (rng.standard_normal(24000)
             + 1j * rng.standard_normal(24000)).astype(np.complex64) * 0.2

        solo_chain = ClientDemodulatorChain(FS, 12000.0, "usb",
                                            compression="none")
        solo_chain.set_frequency_offset(15000.0)
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        solo = Program(solo_chain, spec, 24000, batch_shape=(2,))
        y_solo, _ = solo.process(x)

        fan_chain = ClientDemodulatorChain(FS, 12000.0, "usb",
                                           compression="none")
        fan_chain.set_frequency_offset(15000.0)
        other = ClientDemodulatorChain(FS, 12000.0, "am", compression="none")
        fan = Fanout([("usb", fan_chain), ("am", other)],
                     batch_shapes={"usb": (2,), "am": (2,)})
        prog = Program(fan, spec, 24000)
        y_fan, _ = prog.process(x)
        np.testing.assert_allclose(np.asarray(y_fan["usb"]),
                                   np.asarray(y_solo), atol=2)

    def test_live_params_flow_per_branch(self):
        """Retuning one branch's chain affects only that branch and does
        not recompile (params version bump)."""
        a, b, fft, fan = make_fanout()
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        prog = Program(fan, spec, 24000)
        n = np.arange(24000)
        tone = (0.4 * np.exp(2j * np.pi * (20000 + 800) / FS * n)
                ).astype(np.complex64)
        a.set_frequency_offset(20000.0)
        for _ in range(3):
            y, _ = prog.process(tone)
        usb = np.asarray(y["usb"])[0].astype(np.float32)
        spec_u = np.abs(np.fft.rfft(usb))
        peak = np.fft.rfftfreq(len(usb), 1 / 12000.0)[np.argmax(spec_u[3:]) + 3]
        assert abs(peak - 800.0) < 40.0
        # retune away: tone disappears from branch a
        a.set_frequency_offset(60000.0)
        for _ in range(3):
            y, _ = prog.process(tone)
        usb2 = np.asarray(y["usb"])[0].astype(np.float32)
        s2 = np.abs(np.fft.rfft(usb2))
        band = (np.fft.rfftfreq(len(usb2), 1 / 12000.0) > 700) & \
               (np.fft.rfftfreq(len(usb2), 1 / 12000.0) < 900)
        assert s2[band].max() < 0.2 * spec_u.max()
