"""IMA ADPCM codec (audio + waterfall compression).

Reference analogs: ``pycsdr.modules.AdpcmEncoder(sync=True)`` for client
audio (reference ``csdr/chain/clientaudio.py:34``) and ``FftAdpcm`` for
waterfall rows (``csdr/chain/fft.py:44``; client pads 10 samples,
``htdocs/openwebrx.js:845`` COMPRESS_FFT_PAD_N).  The wire format matches
the reference browser decoder (``htdocs/lib/AudioEngine.js:410-495``):
"SYNC" + int16le stepIndex + int16le predictor, then ADPCM bytes (two
4-bit nibbles per byte, low nibble first).

The codec is a per-sample nonlinear recurrence, but audio rates are tiny
(12 kHz), so a ``lax.scan`` over sample pairs vectorized across all
channels is cheap on TPU.  The scan also emits per-byte codec state so the
host can cut sync frames at arbitrary byte boundaries without re-encoding.
A numpy reference implementation lives in tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32)

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32)


def adpcm_init(batch_shape=()):
    return (jnp.zeros(batch_shape, jnp.int32),   # predictor
            jnp.zeros(batch_shape, jnp.int32))   # step index


def _encode_nibble(carry, sample):
    """One IMA ADPCM encode step.  carry=(predictor, index), sample int32.

    The two table lookups are the whole cost of the encode scan on TPU
    (a per-lane gather per step runs at dynamic-gather speed, ~6× the rest
    of the step).  Both are eliminated: the step table is read through an
    exact one-hot matmul (table values ≤ 32767 are exact in float32 and a
    one-hot contraction sums exactly one of them — MXU work instead of a
    gather), and the index table is closed-form arithmetic on the nibble.
    Bit-identical to the gather version (verified in tests)."""
    predictor, index = carry
    onehot = (index[..., None] == jnp.arange(89, dtype=jnp.int32)
              ).astype(jnp.float32)
    step = (onehot * jnp.asarray(IMA_STEP_TABLE, jnp.float32)
            ).sum(-1).astype(jnp.int32)
    diff = sample - predictor
    sign = (diff < 0).astype(jnp.int32)
    diff = jnp.abs(diff)
    nib = jnp.zeros_like(index)
    delta = step >> 3
    nib, diff, delta = _bit(nib, diff, delta, step, 4)
    step2 = step >> 1
    nib, diff, delta = _bit(nib, diff, delta, step2, 2)
    step4 = step >> 2
    nib, diff, delta = _bit(nib, diff, delta, step4, 1)
    delta = jnp.where(sign == 1, -delta, delta)
    predictor = jnp.clip(predictor + delta, -32768, 32767)
    nib = nib | (sign << 3)
    # IMA_INDEX_TABLE[nib] = -1 for (nib&7) < 4 else 2·(nib&7) − 6
    low = nib & 7
    index = jnp.clip(index + jnp.where(low < 4, -1, 2 * low - 6), 0, 88)
    return (predictor, index), nib


def _bit(nib, diff, delta, stepval, bit):
    take = diff >= stepval
    nib = jnp.where(take, nib | bit, nib)
    diff = jnp.where(take, diff - stepval, diff)
    delta = jnp.where(take, delta + stepval, delta)
    return nib, diff, delta


# codec-state export granularity (bytes).  The AUDIO encoder resets its
# adaptation at every stride boundary (the reset state rides the wire in
# the sync header — SYNC_INTERVAL == STATE_STRIDE), which makes strides
# INDEPENDENT: the encode scan runs STATE_STRIDE steps with channels ×
# strides lanes instead of a whole block of sequential steps.  A serial
# IMA scan is the single most expensive op of the multichannel audio path
# on TPU (tiny per-step VPU work at op-issue latency); strides cut the
# sequential depth 4× here.  100 bytes = 16.7 ms of 12 kHz audio per
# adaptation restart; the header overhead is 8/108 ≈ 7 % of the audio
# wire (≈ 0.5 kB/s per listener).
STATE_STRIDE = 100


def adpcm_encode_seq(state, samples: jnp.ndarray):
    """Sequential (exact-IMA) encode: int16-range samples (..., 2N) →
    (new_state, (bytes (..., N) uint8, stride (..., N/STATE_STRIDE) int32)).

    Used for waterfall rows, whose wire format carries no intra-row codec
    state (the client decodes a whole row continuously from a fresh codec,
    reference csdr/chain/fft.py:44) — so the encoder must be bit-exact
    continuous IMA.  stride = codec state AFTER every STATE_STRIDE-th
    byte, packed (predictor << 16) | (index & 0xFFFF).
    """
    x = jnp.moveaxis(samples.astype(jnp.int32), -1, 0)  # (2N, ...)
    pairs = x.reshape(x.shape[0] // 2, 2, *x.shape[1:])

    def step(carry, pair):
        carry, lo = _encode_nibble(carry, pair[0])
        carry, hi = _encode_nibble(carry, pair[1])
        byte = (lo | (hi << 4)).astype(jnp.uint8)
        packed = (carry[0] << 16) | (carry[1] & 0xFFFF)
        return carry, (byte, packed)

    state, (bytes_, packed) = jax.lax.scan(step, state, pairs)
    stride = packed[STATE_STRIDE - 1::STATE_STRIDE]
    return state, (jnp.moveaxis(bytes_, 0, -1), jnp.moveaxis(stride, 0, -1))


def _estimate_index(xs: jnp.ndarray) -> jnp.ndarray:
    """Per-stride IMA step-index estimate: the table index whose step best
    tracks the stride's mean |Δx| (what the adaptation would converge to)."""
    md = jnp.abs(jnp.diff(xs, axis=-1)).astype(jnp.float32).mean(axis=-1)
    table = jnp.asarray(IMA_STEP_TABLE, jnp.float32)
    return jnp.clip(jnp.searchsorted(table, md), 0, 88).astype(jnp.int32)


def adpcm_encode(state, samples: jnp.ndarray):
    """Stride-parallel IMA encode for the AUDIO path: int16-range samples
    (..., 2N) → (new_state, (bytes (..., N) uint8, stride int32)).

    Each STATE_STRIDE-byte stride encodes independently from a reseeded
    state: predictor = the raw sample just before the stride (exact, no
    discontinuity), step index = estimated from the PREVIOUS stride's
    dynamics (so the state is known before the stride's data — the exported
    stride array carries exactly these reseeds, and the SyncFramer emits a
    sync header at EVERY stride boundary, so the client decoder adopts the
    same state the encoder used; nothing ever desyncs).  The scan is
    STATE_STRIDE steps deep with (channels × strides) lanes — ~N/STRIDE×
    less sequential depth than exact IMA, the TPU-first trade.

    stride[..., i] = start state of stride i+1 (== "state after byte
    (i+1)·STRIDE" as far as the wire is concerned).  Requires
    N % STATE_STRIDE == 0 (AdpcmEncodeStage.divisor).
    """
    x = samples.astype(jnp.int32)
    batch = x.shape[:-1]
    n = x.shape[-1] // 2                      # bytes this block
    s = n // STATE_STRIDE                     # strides this block
    xs = x.reshape(*batch, s, 2 * STATE_STRIDE)
    pred0, idx0 = state
    # start states per stride: (raw sample before stride, index estimated
    # from the stride BEFORE it); stride 0 uses the carried block state
    prev = jnp.concatenate(
        [pred0[..., None], xs[..., :-1, -1]], axis=-1)          # (..., s)
    est = _estimate_index(xs)                                    # (..., s)
    idxs = jnp.concatenate([idx0[..., None], est[..., :-1]], axis=-1)
    pairs = jnp.moveaxis(                                        # (STRIDE, ..., s, 2)
        xs.reshape(*batch, s, STATE_STRIDE, 2), -2, 0)

    def step(carry, pair):
        carry, lo = _encode_nibble(carry, pair[..., 0])
        carry, hi = _encode_nibble(carry, pair[..., 1])
        return carry, (lo | (hi << 4)).astype(jnp.uint8)

    _, bytes_ = jax.lax.scan(step, (prev, idxs), pairs)
    bytes_ = jnp.moveaxis(bytes_, 0, -1).reshape(*batch, n)
    # exported reseeds: start state of each FOLLOWING stride
    stride = ((xs[..., :, -1] & 0xFFFF) << 16) | (est & 0xFFFF)
    new_state = (xs[..., -1, -1], est[..., -1])
    return new_state, (bytes_, stride)


def pack_codec_state(pred, idx):
    """(predictor, index) → packed int32 (host or traced)."""
    return (pred << 16) | (idx & 0xFFFF)


def unpack_codec_state(packed: int) -> tuple[int, int]:
    """Packed int32 → (predictor, step index) on host."""
    v = np.int32(packed)
    return int(v >> 16), int(v & 0xFFFF)


def adpcm_decode_np(data: bytes, state=(0, 0)):
    """Numpy reference decoder (host-side; used in tests and for the FFT
    decompressor parity checks).  Mirrors the browser decodeNibble."""
    predictor, index = state
    out = np.empty(len(data) * 2, np.int16)
    for i, byte in enumerate(data):
        for k, nib in enumerate((byte & 0x0F, byte >> 4)):
            step = IMA_STEP_TABLE[index]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            if nib & 8:
                diff = -diff
            predictor = int(np.clip(predictor + diff, -32768, 32767))
            index = int(np.clip(index + IMA_INDEX_TABLE[nib], 0, 88))
            out[i * 2 + k] = predictor
    return out, (predictor, index)


COMPRESS_FFT_PAD_N = 10  # client skips this many samples (openwebrx.js:845)


def compress_fft_rows(rows_db: np.ndarray):
    """Compress waterfall rows like the reference FftAdpcm
    (csdr/chain/fft.py:44): per row, dB×100 as int16, 10 warm-up pad
    samples prepended, fresh codec per row (the client resets its codec per
    message, openwebrx.js:1124-1128).  All rows encode as ONE batched scan.

    rows_db (R, N) float32 → list of R bytes objects, each (N+PAD)/2 long.
    """
    rows_db = np.atleast_2d(rows_db)
    r = rows_db.shape[0]
    samples = np.clip(rows_db * 100.0, -32768, 32767).astype(np.int16)
    pad = np.repeat(samples[:, :1], COMPRESS_FFT_PAD_N, axis=1)
    padded = np.concatenate([pad, samples], axis=1)
    # pad the SAMPLE count so the byte count is a multiple of 4 (the
    # encoder emits int32 words — see _encode_jit); extra trailing bytes
    # are trimmed before hitting the wire
    nbytes = (padded.shape[1] + 1) // 2
    extra = (-padded.shape[1]) % 8
    if extra:
        padded = np.concatenate(
            [padded, np.repeat(padded[:, -1:], extra, axis=1)], axis=1)
    words = _encode_jit(adpcm_init((r,)), padded)
    try:
        words.copy_to_host_async()   # avoid a blocking round trip (tunnel)
    except (AttributeError, RuntimeError):
        pass
    arr = np.asarray(words).view(np.uint8)
    return [arr[i, :nbytes].tobytes() for i in range(r)]


# calling adpcm_encode eagerly would re-trace (and re-compile) the scan on
# EVERY block — route all host-side encoding through one cached jit.  The
# bytes leave the device as int32 words: sub-word device→host transfers
# are pathologically slow on tunnel transports (runtime/chain.py
# "boundary codecs").
@jax.jit
def _encode_jit(state, samples):
    # waterfall rows: exact continuous IMA (no intra-row state on the wire)
    _, (bytes_, _stride) = adpcm_encode_seq(state, samples)
    return jax.lax.bitcast_convert_type(
        bytes_.reshape(bytes_.shape[:-1] + (bytes_.shape[-1] // 4, 4)),
        jnp.int32)


# data bytes per sync frame (see AudioEngine.js SyncAudioDecoder).  Equal
# to STATE_STRIDE: the stride-parallel audio encoder reseeds its adaptation
# at every stride boundary, and the sync header is how that reseed reaches
# the client decoder — every cut lands exactly on an exported-state stride.
SYNC_INTERVAL = STATE_STRIDE


class SyncFramer:
    """Host-side sync framing: splice "SYNC"+state headers into the encoded
    byte stream every SYNC_INTERVAL bytes, reseeding the client decoder.

    Cut positions are always multiples of STATE_STRIDE (block byte counts
    and SYNC_INTERVAL both are), so the stride-subsampled codec state from
    ``adpcm_encode`` covers every possible header position exactly."""

    def __init__(self):
        self.since_sync = SYNC_INTERVAL  # ⇒ emit a sync header immediately
        self._carry = 0                  # packed state at end of prev block

    def frame(self, bytes_: np.ndarray, stride_states: np.ndarray) -> bytes:
        """bytes_: this block's encoded bytes (multiple of STATE_STRIDE);
        stride_states: packed int32 reseed state at each STATE_STRIDE
        boundary (the start state of the following stride)."""
        out = bytearray()
        n = len(bytes_)
        pos = 0
        while pos < n:
            if self.since_sync >= SYNC_INTERVAL:
                packed = self._carry if pos == 0 else int(
                    stride_states[pos // STATE_STRIDE - 1])
                pred, idx = unpack_codec_state(packed)
                out += b"SYNC" + np.array([idx, pred], "<i2").tobytes()
                self.since_sync = 0
            take = min(n - pos, SYNC_INTERVAL - self.since_sync)
            out += bytes(bytes_[pos:pos + take])
            pos += take
            self.since_sync += take
        if n:
            self._carry = int(stride_states[-1])
        return bytes(out)
