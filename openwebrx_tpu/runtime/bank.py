"""ChannelBank: N listener channels demodulated as ONE batched program.

This is the core TPU replacement for the reference's per-client thread
graphs (reference ``owrx/dsp.py:502-512``: every connected user owns a full
Selector→Demod→Audio chain of C++ threads; SURVEY §2.6).  All channels of a
device that share a chain structure become leading batch dimensions of one
jitted block step; per-channel tuning (offset, squelch, passband) are
traced parameter ARRAYS, so adding/retuning listeners never recompiles —
only growing beyond capacity does (capacity doubles, amortized).

Inactive slots are masked: their offsets park at 0 Hz and their outputs are
ignored by the host; compute cost of a slot is identical either way, which
is the TPU trade (lockstep batch) the design embraces.
"""

from __future__ import annotations

import numpy as np

from openwebrx_tpu.models.receiver import ClientDemodulatorChain, MODE_BANDPASS
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Program


class ChannelBank:
    """A bank of identical-mode channels (one bucket of the engine).

    Mixed-mode receivers use one ChannelBank per mode (bucketed compile
    cache); each bank reads the same device IQ block.
    """

    def __init__(self, in_rate: float, mode: str = "nfm", capacity: int = 16,
                 audio_rate: float = 12000.0, compression: str = "adpcm",
                 target_seconds: float = 0.1, block: int | None = None):
        self.in_rate = float(in_rate)
        self.mode = mode
        self.capacity = int(capacity)
        self.compression = compression
        self.chain = ClientDemodulatorChain(in_rate, audio_rate, mode, compression)
        self._offsets = np.zeros(capacity, np.float32)
        self._squelch = np.full(capacity, -150.0, np.float32)
        self._active = np.zeros(capacity, bool)
        lo, hi = MODE_BANDPASS[mode]
        self._low = np.full(capacity, float(lo))
        self._high = np.full(capacity, float(hi))
        self._nr = np.full(capacity, -100.0, np.float32)  # ≤ −100 ⇒ NR off
        spec = StreamSpec(Format.COMPLEX_FLOAT, in_rate)
        # `block` is the DEVICE block (the runtime's dispatch cadence).  A
        # chain whose own block requirement exceeds it (e.g. WFM's long
        # resampler chain) accumulates chunk_ratio device chunks on-device
        # and dispatches every Nth block — the device cadence (and thus
        # every OTHER bucket's latency) is not held hostage by the worst
        # chain's LCM.
        self.chunk_ratio = 1
        if block is not None:
            from math import gcd
            from openwebrx_tpu.models.stages import block_requirement
            req = block_requirement(self.chain, spec)
            bank_block = block * req // gcd(block, req)
            self.chunk_ratio = bank_block // block
            self.block = bank_block
        else:
            self.block = plan_block_size(self.chain, spec, target_seconds)
        self._accum: list = []
        self.program = Program(self.chain, spec, self.block,
                               batch_shape=(capacity,))
        self._push_params()

    # ------------------------------------------------------------- slots --
    def add_channel(self, offset_hz: float, squelch_db: float = -150.0) -> int:
        free = np.flatnonzero(~self._active)
        if len(free) == 0:
            raise RuntimeError("bank full — grow() first")
        slot = int(free[0])
        self._active[slot] = True
        self._offsets[slot] = offset_hz
        self._squelch[slot] = squelch_db
        self._push_params()
        return slot

    def remove_channel(self, slot: int):
        self._active[slot] = False
        self._offsets[slot] = 0.0
        self._squelch[slot] = -150.0
        self._push_params()

    def retune(self, slot: int, offset_hz: float):
        self._offsets[slot] = offset_hz
        self._push_params()

    def set_squelch(self, slot: int, level_db: float):
        self._squelch[slot] = level_db
        self._push_params()

    def set_bandpass(self, slot: int, low_hz: float, high_hz: float):
        """Per-listener passband drag (reference low_cut/high_cut params)."""
        self._low[slot] = low_hz
        self._high[slot] = high_hz
        self._push_params()

    def set_nr(self, slot: int, threshold_db: float):
        """Per-listener noise reduction (reference nr_enabled/nr_threshold
        dspcontrol params); threshold ≤ −100 dB disables."""
        self._nr[slot] = threshold_db
        self._push_params()

    @property
    def active_slots(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    @property
    def n_active(self) -> int:
        return int(self._active.sum())

    def _push_params(self):
        self.chain.selector.shift.set_rate(-self._offsets / self.in_rate)
        self.chain.selector.squelch.set_level(self._squelch)
        self.chain.selector.set_bandpass(self._low, self._high)
        self.chain.audio.noise_filter.set_threshold(self._nr)

    # ------------------------------------------------------------ stream --
    def feed_dispatch(self, xdev, to_host: bool = True):
        """Feed one packed device chunk (device-block samples, shape
        (block, 2) float32, already on device).  Returns the program's
        pending outputs when a full bank block was dispatched, else None
        (chunk buffered on-device until chunk_ratio chunks arrived).
        to_host=False defers the device→host copy to the runtime's
        cross-program join."""
        if self.chunk_ratio == 1:
            return self.program.dispatch(xdev, to_host=to_host)
        self._accum.append(xdev)
        if len(self._accum) < self.chunk_ratio:
            return None
        import jax.numpy as jnp
        x = jnp.concatenate(self._accum, axis=0)
        self._accum = []
        return self.program.dispatch(x, to_host=to_host)

    def process(self, iq_block):
        """iq_block (block,) complex64 → (audio (capacity, out_block), aux).

        The single IQ block is fanned out to all channels INSIDE the jitted
        program (the shift stage's (C,)-shaped phase broadcasts against the
        (B,)-shaped input), so the host transfers the block once, not C
        times.  Host extracts only active rows from the result.
        """
        return self.program.process(np.asarray(iq_block))
