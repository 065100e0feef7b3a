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
import jax.numpy as jnp

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
                 taps_per_phase: int = 16, target_seconds: float = 0.1,
                 block: int | None = None, capacity: int | None = None,
                 delivery_stride: int = 1):
        self.in_rate = float(in_rate)
        self.m = int(m)
        self.mode = mode
        self.compression = compression
        # capacity=None → dense: all M channels demodulate and ship (the
        # 1000+-channel BASELINE shape; also what the pod sharding layers
        # over).  capacity=N → slot-gathered: a traced (N,) channel-index
        # array gathers the N OCCUPIED channel streams out of the PFB
        # before the demod chains, so chain compute and the fused result
        # transfer scale with live services, not with M (a 4096-channel
        # PFB serving 40 dials demodulates 40 rows, not 4096).
        self.capacity = int(capacity) if capacity else None
        self.delivery_stride = max(1, int(delivery_stride))
        self._out_accum: list = []
        self._n = self.capacity or self.m       # chain batch size
        self.channel_rate = self.in_rate / self.m
        self.prototype = pfb.design_prototype(self.m, taps_per_phase)
        self.taps_per_phase = taps_per_phase
        self.chain = ClientDemodulatorChain(self.channel_rate, audio_rate,
                                            mode, compression)
        spec = StreamSpec(Format.COMPLEX_FLOAT, self.channel_rate)
        # `block` is the DEVICE block (the runtime's dispatch cadence).
        # The bank's own block must be a multiple of it AND of m × the
        # chain's divisibility requirement; when they differ the bank
        # accumulates device chunks on-device and dispatches every Nth
        # block (same trade as ChannelBank.chunk_ratio)
        self.chunk_ratio = 1
        if block is not None:
            from math import gcd
            from openwebrx_tpu.models.stages import block_requirement
            req = block_requirement(self.chain, spec) * self.m
            bank_block = block * req // gcd(block, req)
            self.chunk_ratio = bank_block // block
            self.block = bank_block
            self.channel_block = bank_block // self.m
        else:
            self.channel_block = plan_block_size(self.chain, spec,
                                                 target_seconds)
            self.block = self.channel_block * self.m
        self._accum: list = []
        self.chain.plan(spec, self.channel_block)

        n = self._n
        self._chan = np.zeros(n, np.int32)              # slot → PFB channel
        self._fine = np.zeros(n, np.float32)            # Hz within channel
        self._squelch = np.full(n, -150.0, np.float32)
        self._active = np.zeros(n, bool)
        lo, hi = MODE_BANDPASS[mode]
        self._low = np.full(n, float(lo))
        self._high = np.full(n, float(hi))
        self._nr = np.full(n, -100.0, np.float32)       # ≤ −100 ⇒ NR off
        if self.capacity is None:
            self._chan = np.arange(n, dtype=np.int32)   # slot s ≡ channel s
        self._params_dirty = True
        self._params_cache = None
        params0 = self._params()    # production slot-shaped param arrays

        def _init():
            return (pfb.channelizer_init(self.m, taps_per_phase),
                    self.chain.init_state((n,)))

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
        idx, chain_params = params
        tail, channels = pfb.channelize(tail, self.prototype, x, self.m)
        if self.capacity is not None:
            # gather the occupied channels' streams: demod batch = slots
            channels = jnp.take(channels, idx, axis=0)
        chain_state, y, aux = self.chain.apply(chain_state, chain_params,
                                               channels)
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

    def channel_in_use(self, k: int) -> bool:
        """Is PFB channel k already serving an active slot?"""
        return bool(np.any(self._active & (self._chan == k)))

    def has_free_slot(self) -> bool:
        return bool(np.any(~self._active))

    def assign(self, freq_offset_hz: float, squelch_db: float = -150.0) -> int:
        """Activate a slot on the channel containing the given frequency;
        returns the SLOT index (== channel index in dense mode).

        In slot-gathered mode several slots may share one PFB channel (the
        gather takes duplicate indices): N listeners parked on the same
        station cost N cheap channel-rate chains off ONE filterbank, not N
        full-rate chains (the reference's per-client cost,
        owrx/dsp.py:437-512)."""
        k, fine = self.channel_for(freq_offset_hz)
        if self.capacity is None:
            if self._active[k]:
                raise ValueError(f"PFB channel {k} already occupied")
            s = k
        else:
            free = np.flatnonzero(~self._active)
            if len(free) == 0:
                raise ValueError("PFB bank full — all slots taken")
            s = int(free[0])
            self._chan[s] = k
        self._active[s] = True
        self._fine[s] = fine
        self._squelch[s] = squelch_db
        self._params_dirty = True
        return s

    def release(self, s: int):
        self._active[s] = False
        self._fine[s] = 0.0
        self._squelch[s] = -150.0
        if self.capacity is not None:
            self._chan[s] = 0       # parked (inactive slots never conflict)
        self._params_dirty = True

    # ChannelBank-compatible slot surface (DeviceRuntime handles call these)
    def remove_channel(self, s: int):
        self.release(s)

    def retune(self, s: int, offset_hz: float) -> int:
        """Move a slot to a new frequency.  The new dial may land in a
        DIFFERENT PFB channel — returns the (possibly new) slot index."""
        new_k, fine = self.channel_for(offset_hz)
        cur_k = int(self._chan[s])
        if new_k == cur_k:
            self._fine[s] = fine
            self._params_dirty = True
            return s
        if self.capacity is not None:
            # gathered mode: channels are shareable — just remap the slot
            self._chan[s] = new_k
            self._fine[s] = fine
            self._params_dirty = True
            return s
        # dense mode: slot index IS the channel index — move the slot
        if self._active[new_k]:
            raise ValueError(f"PFB channel {new_k} already occupied")
        sq, lo, hi, nr = (self._squelch[s], self._low[s], self._high[s],
                          self._nr[s])
        self.release(s)
        self._active[new_k] = True
        self._fine[new_k] = fine
        self._squelch[new_k], self._nr[new_k] = sq, nr
        self._low[new_k], self._high[new_k] = lo, hi
        self._params_dirty = True
        return new_k

    def set_squelch(self, s: int, level_db: float):
        self._squelch[s] = level_db
        self._params_dirty = True

    def set_nr(self, s: int, threshold_db: float):
        self._nr[s] = threshold_db
        self._params_dirty = True

    def set_bandpass(self, s: int, low_hz: float, high_hz: float):
        self._low[s], self._high[s] = low_hz, high_hz
        self._params_dirty = True

    def fits(self, freq_offset_hz: float, low_hz: float, high_hz: float,
             margin: float = 0.4) -> bool:
        """Can this dial serve from the critically-sampled PFB?  The whole
        passband (fine offset + mode bandpass) must sit inside the channel's
        usable width (±margin·channel_rate, default 80 % of the slice —
        beyond that the prototype's transition band attenuates).  Dials
        that straddle a channel edge fall back to a full-rate bank slot,
        the same compromise the reference's resampler-grouping optimizer
        makes when a dial doesn't fit a group (owrx/service/__init__.py:
        199-252)."""
        _, fine = self.channel_for(freq_offset_hz)
        half = margin * self.channel_rate
        return (fine + low_hz) >= -half and (fine + high_hz) <= half

    @property
    def active_channels(self) -> np.ndarray:
        """PFB channel indices of the active slots."""
        return self._chan[self._active]

    @property
    def n_active(self) -> int:
        return int(self._active.sum())

    def _params(self):
        """Push control arrays into the chain and (re-)materialize the
        param pytree only when something changed since the last dispatch.
        Program params = (slot→channel gather indices, chain params)."""
        if self._params_dirty or self._params_cache is None:
            self.chain.selector.shift.set_rate(-self._fine / self.channel_rate)
            self.chain.selector.squelch.set_level(self._squelch)
            self.chain.selector.set_bandpass(self._low, self._high)
            self.chain.audio.noise_filter.set_threshold(self._nr)
            self._params_cache = (self._chan.copy(), self.chain.params())
            self._params_dirty = False
        return self._params_cache

    # kept for callers that force-push controls (older API)
    def _push_params(self):
        self._params_dirty = True
        self._params()

    # ------------------------------------------------------------- stream --
    def feed_dispatch(self, xdev, to_host: bool = True):
        """Feed one packed device chunk (device-block samples, already on
        device).  Returns the pending fused output when a full bank block
        was dispatched, else None (chunks buffered on-device until
        chunk_ratio chunks arrived) — the DeviceRuntime feed surface,
        same contract as ChannelBank.feed_dispatch.

        With ``delivery_stride`` K > 1, the fused outputs of K consecutive
        bank blocks are concatenated ON DEVICE and come back as ONE
        device→host transfer (fetch then yields K (y, aux) results in
        order).  Background services tolerate a few hundred ms of delivery
        batching, and each avoided per-block transfer saves a serialized
        tunnel round trip — the same trade as output fusion, one level up."""
        if self.chunk_ratio == 1:
            x = xdev
        else:
            self._accum.append(xdev)
            if len(self._accum) < self.chunk_ratio:
                return None
            x = jnp.concatenate(self._accum, axis=0)
            self._accum = []
        if self.delivery_stride <= 1:
            return self.dispatch(x, to_host=to_host)
        fused, _ = self.dispatch(x, to_host=False)
        self._out_accum.append(fused)
        if len(self._out_accum) < self.delivery_stride:
            return None
        joined = jnp.concatenate(self._out_accum)
        self._out_accum = []
        if to_host:
            try:
                joined.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return joined, self.delivery_stride

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
        from openwebrx_tpu.runtime.keepalive import TransportKeepalive
        TransportKeepalive.note_fetch()
        yp, auxp = unfuse_buffer(buf, self._fuse_treedef, self._fuse_plan)
        y = jax.tree.map(_decode_out_leaf, yp, self._y_codec)
        aux = jax.tree.map(_decode_out_leaf, auxp, self._aux_codec)
        return y, aux

    def fetch_many(self, joined, n: int):
        """Decode a delivery-stride batch: one fetch of the K-block joined
        buffer → list of K (y, aux) results in dispatch order."""
        buf = np.asarray(joined)
        from openwebrx_tpu.runtime.keepalive import TransportKeepalive
        TransportKeepalive.note_fetch()
        out = []
        for i in range(n):
            seg = buf[i * self._fuse_words:(i + 1) * self._fuse_words]
            yp, auxp = unfuse_buffer(seg, self._fuse_treedef,
                                     self._fuse_plan)
            out.append((jax.tree.map(_decode_out_leaf, yp, self._y_codec),
                        jax.tree.map(_decode_out_leaf, auxp,
                                     self._aux_codec)))
        return out

    def process(self, iq_block):
        """One block, synchronous: → (audio (M, out), aux)."""
        return self.fetch(*self.dispatch(iq_block))

    def signature(self):
        return ("channelized", self.m, self.mode, self.channel_block,
                self.capacity, digest(self.prototype))
