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
    """One IMA ADPCM encode step.  carry=(predictor, index), sample int32."""
    predictor, index = carry
    step = jnp.take(jnp.asarray(IMA_STEP_TABLE), index)
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
    index = jnp.clip(index + jnp.take(jnp.asarray(IMA_INDEX_TABLE), nib), 0, 88)
    return (predictor, index), nib


def _bit(nib, diff, delta, stepval, bit):
    take = diff >= stepval
    nib = jnp.where(take, nib | bit, nib)
    diff = jnp.where(take, diff - stepval, diff)
    delta = jnp.where(take, delta + stepval, delta)
    return nib, diff, delta


# codec-state export granularity (bytes): sync cuts land only on stride
# multiples, so SYNC_INTERVAL % STATE_STRIDE == 0 and block byte counts are
# forced to stride multiples (AdpcmEncodeStage.divisor).  200 keeps the
# state export at 0.5 % of the audio volume (device→host readback is the
# scarce resource on tunnel-attached chips).
STATE_STRIDE = 200


def adpcm_encode(state, samples: jnp.ndarray):
    """Encode int16-range samples (..., 2N) → (new_state, (bytes, stride)).

    bytes: (..., N) uint8.  stride: (..., N/STATE_STRIDE) int32 — the codec
    state AFTER every STATE_STRIDE-th byte, packed (predictor << 16) | index.
    The host SyncFramer cuts sync frames only at stride multiples (the
    sync interval is a stride multiple), so this is all the state it needs
    — exporting full per-byte state was 80 % of the audio readback volume.
    Requires N % STATE_STRIDE == 0 (AdpcmEncodeStage.divisor).
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
    _, (bytes_, _stride) = adpcm_encode(state, samples)
    return jax.lax.bitcast_convert_type(
        bytes_.reshape(bytes_.shape[:-1] + (bytes_.shape[-1] // 4, 4)),
        jnp.int32)


# data bytes per sync frame (see AudioEngine.js SyncAudioDecoder) — a
# multiple of STATE_STRIDE so every cut lands on an exported-state boundary
SYNC_INTERVAL = 1000


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
        stride_states: packed int32, codec state after bytes 8, 16, …"""
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
