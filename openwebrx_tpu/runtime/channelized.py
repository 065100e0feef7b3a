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
from openwebrx_tpu.runtime.chain import (
    digest, host_pack_complex, _decode_out_leaf, _encode_out_leaf,
    _is_complex_aval, _leaf_codec, _pack_leaf, _unpack_leaf,
    fuse_leaves, fuse_plan, unfuse_buffer,
)


class ChannelizedBank:
    """All M channels demodulated with one mode's chain structure.

    (Mixed modes → one ChannelizedBank per mode bucket, same trade as
    ChannelBank.)

    Streaming API mirrors Program: ``dispatch()`` launches a block and
    starts the device→host result copies without blocking; ``fetch()``
    decodes them; ``process()`` = fetch(dispatch()).  Params (fine shifts,
    squelch levels, passbands) are version-cached — control changes mark
    them dirty, the next dispatch re-materializes once (runtime/chain.py
    module docstring: per-block param rebuilds dominate tunnel dispatch).
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
        self._params_dirty = True
        self._params_cache = None
        params0 = self._params()    # production (M,)-shaped param arrays

        def _init():
            return (pfb.channelizer_init(self.m, taps_per_phase),
                    self.chain.init_state((self.m,)))

        s_aval = jax.eval_shape(_init)
        self._s_mask = jax.tree.map(_is_complex_aval, s_aval)
        x_aval = jax.ShapeDtypeStruct((self.block,), np.complex64)
        _, y_aval, aux_aval = jax.eval_shape(
            self._raw_step, s_aval, params0, x_aval)
        self._y_codec = jax.tree.map(_leaf_codec, y_aval)
        self._aux_codec = jax.tree.map(_leaf_codec, aux_aval)
        self._fuse_treedef, self._fuse_plan, self._fuse_words = fuse_plan(
            y_aval, aux_aval, self._y_codec, self._aux_codec)
        self.state = jax.jit(
            lambda: jax.tree.map(_pack_leaf, _init()))()
        self._step = jax.jit(self._make_step(), donate_argnums=(0,))

    def _raw_step(self, state, params, x):
        tail, chain_state = state
        tail, channels = pfb.channelize(tail, self.prototype, x, self.m)
        chain_state, y, aux = self.chain.apply(chain_state, params, channels)
        return (tail, chain_state), y, aux

    def _make_step(self):
        s_mask, raw = self._s_mask, self._raw_step
        y_codec, aux_codec = self._y_codec, self._aux_codec

        def step(pstate, params, px):
            state = jax.tree.map(_unpack_leaf, pstate, s_mask)
            x = _unpack_leaf(px, True)
            new_state, y, aux = raw(state, params, x)
            y_enc = jax.tree.map(_encode_out_leaf, y, y_codec)
            aux_enc = jax.tree.map(_encode_out_leaf, aux, aux_codec)
            # all outputs fused into ONE int32 buffer: one D2H transfer per
            # block instead of one serialized RPC per leaf (fuse_plan)
            return (jax.tree.map(_pack_leaf, new_state),
                    fuse_leaves(jax.tree.leaves((y_enc, aux_enc))))

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
        self._params_dirty = True
        return k

    def release(self, k: int):
        self._active[k] = False
        self._fine[k] = 0.0
        self._params_dirty = True

    def set_bandpass(self, k: int, low_hz: float, high_hz: float):
        self._low[k], self._high[k] = low_hz, high_hz
        self._params_dirty = True

    @property
    def active_channels(self) -> np.ndarray:
        return np.flatnonzero(self._active)

    def _params(self):
        """Push control arrays into the chain and (re-)materialize the
        param pytree only when something changed since the last dispatch."""
        if self._params_dirty or self._params_cache is None:
            self.chain.selector.shift.set_rate(-self._fine / self.channel_rate)
            self.chain.selector.squelch.set_level(self._squelch)
            self.chain.selector.set_bandpass(self._low, self._high)
            self._params_cache = self.chain.params()
            self._params_dirty = False
        return self._params_cache

    # kept for callers that force-push controls (older API)
    def _push_params(self):
        self._params_dirty = True
        self._params()

    # ------------------------------------------------------------- stream --
    def pack_input(self, iq_block: np.ndarray) -> np.ndarray:
        """Host complex block → the packed float32 form dispatch() accepts
        (use with jax.device_put to stage benchmark input in HBM)."""
        return host_pack_complex(np.asarray(iq_block))

    def dispatch(self, iq_block, to_host: bool = True):
        """iq_block (block,) complex64 (np) or packed (block, 2) float32 /
        int16 (np or device-resident) → (fused, None) where fused is the
        in-flight single int32 output buffer (all output leaves fused on
        device — ONE D2H transfer per block).  to_host=False skips
        initiating the copy — for consumers that keep results on device
        (device-resident pipelines, throughput benches)."""
        if np.iscomplexobj(iq_block):
            if iq_block.shape[-1] != self.block:
                raise ValueError(
                    f"expected {self.block} samples, got {iq_block.shape[-1]}")
            iq_block = host_pack_complex(np.asarray(iq_block))
        elif not (iq_block.ndim >= 2 and iq_block.shape[-2] == self.block
                  and iq_block.shape[-1] == 2):
            raise ValueError(
                f"expected {self.block} complex samples (or packed "
                f"({self.block}, 2) float32), got {iq_block.shape}")
        self.state, fused = self._step(self.state, self._params(), iq_block)
        if to_host:
            try:
                fused.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return fused, None

    def fetch(self, fused, _unused=None):
        """Decode a dispatch() result: one fetch of the fused buffer, then
        zero-copy views (complex → np complex64, sub-word → original
        dtype)."""
        buf = np.asarray(fused)
        yp, auxp = unfuse_buffer(buf, self._fuse_treedef, self._fuse_plan)
        y = jax.tree.map(_decode_out_leaf, yp, self._y_codec)
        aux = jax.tree.map(_decode_out_leaf, auxp, self._aux_codec)
        return y, aux

    def process(self, iq_block):
        """One block, synchronous: → (audio (M, out), aux)."""
        return self.fetch(*self.dispatch(iq_block))

    def signature(self):
        return ("channelized", self.m, self.mode, self.channel_block,
                digest(self.prototype))
