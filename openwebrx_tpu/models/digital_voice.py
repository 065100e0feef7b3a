"""Digital-voice symbol front-ends: DMR / YSF / D-Star / NXDN.

Reference: ``csdr/chain/digiham.py:14-120`` — FmDemod → DcBlock → RRC
filter → (G)FSK demodulator → digiham frame decoder → MbeSynthesizer
(codecserver) → audio, with the decoder's side metadata channel feeding
``owrx/meta.py``.

TPU-first split: everything up to and including symbol slicing is batched
TPU DSP (discriminator, DC block, RRC matched filter, feedforward timing
recovery, adaptive 4FSK slicer — ``ops/fsk.py``); only the protocol frame
decode and the MBE vocoder remain external (digiham's ``dmr_decoder`` /
``ysf_decoder`` / … consume exactly this dibit stream on stdin, one
uint8 per symbol).  That inverts the reference's C-pipeline shape: the
per-sample work scales with listener count on the device, and the host
process only sees 4800 sym/s per channel.

All four modes run a 48 kHz complex IF (reference getFixedIfSampleRate):
DMR/YSF/D-Star at 4800 baud → 10 samples/symbol; NXDN at 2400 baud → 20.
"""

from __future__ import annotations

import numpy as np

from openwebrx_tpu.models.secondary import (
    AuxWaterfallStage, RealToComplexStage, TimingRecoveryStage,
)
from openwebrx_tpu.models.selector import Selector
from openwebrx_tpu.models.stages import (
    DcBlockStage, FirDecimateStage, FmDemodStage, OpStage,
)
from openwebrx_tpu.ops import firdes, fsk
from openwebrx_tpu.runtime.chain import Chain

DV_IF_RATE = 48000.0


class Fsk4SliceStage(OpStage):
    """Terminal: complex symbol samples → real part → dibits (uint8)."""

    name = "fsk4_slice"

    def _out_spec(self, in_spec):
        from openwebrx_tpu.ops.formats import Format
        return in_spec.with_format(Format.CHAR)

    def apply(self, state, params, x):
        return state, fsk.fsk4_slice(jnp_real(x)), {}

    def signature(self):
        return ("fsk4_slice",)


def jnp_real(x):
    import jax.numpy as jnp
    return jnp.real(x).astype(jnp.float32)


class DvSymbolChain(Chain):
    """Device IQ → dibit stream for one digital-voice mode."""

    def __init__(self, in_rate: float, baud: float = 4800.0,
                 rrc_alpha: float = 0.2, bandwidth: float = 6250.0,
                 name: str = "dv"):
        self.baud = baud
        sps = int(round(DV_IF_RATE / baud))
        self.selector = Selector(in_rate, DV_IF_RATE, with_squelch=False)
        # channel bandpass per the reference mode table (owrx/modes.py:134-139:
        # DMR/YSF ±6250, D-Star/NXDN ±3250) — also keeps out-of-channel energy
        # away from the nonlinear discriminator + timing estimator
        self.selector.set_bandpass(-bandwidth, bandwidth)
        rrc = firdes.root_raised_cosine_taps(sps, rrc_alpha).astype(np.float32)
        super().__init__([
            self.selector,
            AuxWaterfallStage(),
            FmDemodStage(),
            DcBlockStage(),
            RealToComplexStage(),
            FirDecimateStage(1, taps=rrc, name="dv_rrc"),
            TimingRecoveryStage(sps=sps),
            Fsk4SliceStage(),
        ], name=name)

    def set_frequency_offset(self, offset_hz: float):
        self.selector.set_frequency_offset(offset_hz)

    def set_carrier(self, carrier_hz: float):
        pass  # DV modes are channelized; no fine cursor


# mode → chain factory (baud / filter width per csdr/chain/digiham.py:76-120)
DV_FACTORY = {
    "dmr": lambda in_rate: DvSymbolChain(in_rate, 4800.0, 0.2, 6250.0, name="dmr"),
    "ysf": lambda in_rate: DvSymbolChain(in_rate, 4800.0, 0.2, 6250.0, name="ysf"),
    "dstar": lambda in_rate: DvSymbolChain(in_rate, 4800.0, 0.5, 3250.0, name="dstar"),
    "nxdn": lambda in_rate: DvSymbolChain(in_rate, 2400.0, 0.2, 3250.0, name="nxdn"),
    # M17 (spec §3): 4800 sym/s 4FSK, RRC α=0.5, 9 kHz channel — the
    # symbol path feeds the NATIVE link layer (digimodes/m17.py) for
    # metadata; audio stays with m17-demod (ExecAudioHandle)
    "m17": lambda in_rate: DvSymbolChain(in_rate, 4800.0, 0.5, 4500.0, name="m17"),
}

# mode → (decoder command, mbe mode arg) — digiham binaries; {meta_fd} is
# substituted by SubprocessPipeline when a metadata callback is attached
DV_DECODERS = {
    "dmr": ["dmr_decoder", "--fifo", "/dev/fd/{meta_fd}"],
    "ysf": ["ysf_decoder", "--fifo", "/dev/fd/{meta_fd}"],
    "dstar": ["dstar_decoder", "--fifo", "/dev/fd/{meta_fd}"],
    "nxdn": ["nxdn_decoder", "--fifo", "/dev/fd/{meta_fd}"],
}
