"""ChannelizedBank: PFB frontend + per-channel demod chains, one program.

The scaling engine for BASELINE configs #3/#5 (64…1000+ channels): instead
of each channel filtering the full-rate stream (ChannelBank — fine for tens
of listeners), the polyphase filterbank splits the wideband input into M
critically-sampled channel streams for the cost of ONE prototype filter +
FFT, and the demodulator chains run batched at the low channel rate.
Arithmetic per input sample is O(P + log M + chain/M) instead of O(C·T/D).

A listener/service at frequency f maps to channel k = round(f·M/fs) plus a
fine shift of (f − k·fs/M) applied by the chain's selector at channel rate.
"""

from __future__ import annotations

import numpy as np
import jax

from openwebrx_tpu.models.receiver import ClientDemodulatorChain, MODE_BANDPASS
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops import channelizer as pfb
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import digest


class ChannelizedBank:
    """All M channels demodulated with one mode's chain structure.

    (Mixed modes → one ChannelizedBank per mode bucket, same trade as
    ChannelBank.)
    """

    def __init__(self, in_rate: float, m: int, mode: str = "usb",
                 audio_rate: float = 12000.0, compression: str = "none",
                 taps_per_phase: int = 16, target_seconds: float = 0.1):
        self.in_rate = float(in_rate)
        self.m = int(m)
        self.mode = mode
        self.channel_rate = self.in_rate / self.m
        self.prototype = pfb.design_prototype(self.m, taps_per_phase)
        self.taps_per_phase = taps_per_phase
        self.chain = ClientDemodulatorChain(self.channel_rate, audio_rate,
                                            mode, compression)
        spec = StreamSpec(Format.COMPLEX_FLOAT, self.channel_rate)
        self.channel_block = plan_block_size(self.chain, spec, target_seconds)
        self.block = self.channel_block * self.m
        self.chain.plan(spec, self.channel_block)

        self._fine = np.zeros(self.m, np.float32)       # Hz within channel
        self._squelch = np.full(self.m, -150.0, np.float32)
        self._active = np.zeros(self.m, bool)
        lo, hi = MODE_BANDPASS[mode]
        self._low = np.full(self.m, float(lo))
        self._high = np.full(self.m, float(hi))
        self._push_params()

        self.state = (
            pfb.channelizer_init(self.m, taps_per_phase),
            self.chain.init_state((self.m,)),
        )
        self._step = jax.jit(self._make_step(), donate_argnums=(0,))

    def _make_step(self):
        chain, proto, m = self.chain, self.prototype, self.m

        def step(state, params, x):
            tail, chain_state = state
            tail, channels = pfb.channelize(tail, proto, x, m)
            chain_state, y, aux = chain.apply(chain_state, params, channels)
            return (tail, chain_state), y, aux

        return step

    # ------------------------------------------------------------- tuning --
    def channel_for(self, freq_offset_hz: float) -> tuple[int, float]:
        """Map a frequency offset (from device center) to (channel index,
        fine offset inside that channel)."""
        k = int(round(freq_offset_hz * self.m / self.in_rate)) % self.m
        center = pfb.channel_frequencies(self.m, self.in_rate)[k]
        return k, freq_offset_hz - center

    def assign(self, freq_offset_hz: float, squelch_db: float = -150.0) -> int:
        """Activate the channel containing the given frequency."""
        k, fine = self.channel_for(freq_offset_hz)
        self._active[k] = True
        self._fine[k] = fine
        self._squelch[k] = squelch_db
        self._push_params()
        return k

    def release(self, k: int):
        self._active[k] = False
        self._fine[k] = 0.0
        self._push_params()

    def set_bandpass(self, k: int, low_hz: float, high_hz: float):
        self._low[k], self._high[k] = low_hz, high_hz
        self._push_params()

    @property
    def active_channels(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    def _push_params(self):
        self.chain.selector.shift.set_rate(-self._fine / self.channel_rate)
        self.chain.selector.squelch.set_level(self._squelch)
        self.chain.selector.set_bandpass(self._low, self._high)

    # ------------------------------------------------------------- stream --
    def process(self, iq_block: np.ndarray):
        """iq_block (block,) complex64 → (audio (M, out), aux)."""
        if iq_block.shape[-1] != self.block:
            raise ValueError(f"expected {self.block} samples, got {iq_block.shape[-1]}")
        self.state, y, aux = self._step(self.state, self.chain.params(), iq_block)
        return y, aux

    def signature(self):
        return ("channelized", self.m, self.mode, self.channel_block,
                digest(self.prototype))
