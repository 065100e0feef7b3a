"""Stage wrappers for the DSP ops (declarative chain building blocks).

Each wrapper exposes the same *control surface* as its reference analog
(live setters for offset, bandpass, squelch, …) but mutates host-side
parameter values that flow into the jitted program as traced arrays —
live control never recompiles (reference does live graph surgery instead,
``csdr/chain/selector.py:132-166``).

Block-size negotiation: every stage declares ``ratio()`` (output/input
block length as a Fraction) and ``divisor()`` (divisibility required of
its input block), so ``plan_block_size`` can pick the smallest block of
roughly a target duration that keeps every stage's shapes integral and
static under jit.
"""

from __future__ import annotations

from fractions import Fraction
from math import gcd

import numpy as np
import jax.numpy as jnp

from openwebrx_tpu.ops import firdes, nco, fir, iir, demod, agc, squelch, fftops, bandpass, adpcm, convert
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Stage, Chain, digest


def best_chunk(block: int, target: int) -> int:
    """The divisor of ``block`` closest (log-scale) to ``target``.

    Cadence-type stages (squelch measurement windows, NR hops) chunk their
    input internally; their cadence is a soft spec (reference "16
    measurements/s", csdr/chain/selector.py:104), so they adapt to the
    planned block instead of constraining it — a hard ``divisor()`` from
    e.g. rate/16 = 15625 = 5⁶ collides with the 2-power denominators of
    the fractional resamplers and explodes the chain LCM to seconds."""
    block = int(block)
    target = max(1, int(target))
    divs = []
    d = 1
    while d * d <= block:
        if block % d == 0:
            divs.append(d)
            divs.append(block // d)
        d += 1
    return min(divs, key=lambda v: abs(np.log(v / target)))


class OpStage(Stage):
    """Base with ratio/divisor defaults."""

    def ratio(self, in_spec: StreamSpec) -> Fraction:
        return Fraction(1)

    def divisor(self, in_spec: StreamSpec) -> int:
        return 1

    def apply(self, state, params, x):
        raise NotImplementedError

    def plan(self, in_spec: StreamSpec, block: int):
        self.in_spec = in_spec
        self.block = block
        r = self.ratio(in_spec)
        out_block = block * r
        if out_block.denominator != 1:
            raise ValueError(f"{self.label}: block {block} × ratio {r} not integral")
        return self._out_spec(in_spec), int(out_block)

    def _out_spec(self, in_spec: StreamSpec) -> StreamSpec:
        return in_spec


# ------------------------------------------------------------------ shift --
class ShiftStage(OpStage):
    """NCO mixer (reference Shift, csdr/chain/selector.py:95)."""

    def __init__(self, rate=0.0, name: str = "shift"):
        self.name = name
        self._rate = rate

    def set_rate(self, rate):
        """Scalar or per-channel array of normalized rates."""
        self._rate = rate
        self._bump()

    def init_state(self, batch_shape=()):
        return nco.shift_init(batch_shape)

    def params(self):
        # host-side float64 → int32 fixed-point: exact phase accumulation
        # on device, frequency resolution 2⁻³²·fs (ops/nco.py)
        return jnp.asarray(nco.rate_to_fixed(self._rate))

    def apply(self, state, params, x):
        state, y = nco.shift_apply(state, params, x)
        return state, y, {}

    def signature(self):
        return ("shift",)


# -------------------------------------------------------------- decimator --
class FirDecimateStage(OpStage):
    """Integer FIR decimation (reference FirDecimate, csdr/chain/selector.py:29)."""

    def __init__(self, decimation: int, transition_bw: float = 0.05,
                 cutoff: float | None = None, taps=None,
                 name: str = "fir_decimate"):
        self.name = name
        self.decimation = int(decimation)
        self.transition_bw = float(transition_bw)
        if taps is not None:
            self.taps = taps  # caller-designed filter (e.g. RRC matched filter)
        else:
            cutoff = cutoff if cutoff is not None else 0.5 / self.decimation - transition_bw / 2
            self.taps = firdes.lowpass_taps(max(cutoff, 1e-4), transition_bw)

    def ratio(self, in_spec):
        return Fraction(1, self.decimation)

    def divisor(self, in_spec):
        return self.decimation

    def _out_spec(self, in_spec):
        return in_spec.with_rate(in_spec.rate / self.decimation)

    def init_state(self, batch_shape=()):
        return fir.fir_init(len(self.taps), batch_shape,
                            complex_input=self.in_spec.format.is_complex)

    def apply(self, state, params, x):
        state, y = fir.fir_apply(state, self.taps, x, self.decimation)
        return state, y, {}

    def signature(self):
        return ("fir_decimate", self.decimation, digest(self.taps))


class FractionalDecimatorStage(OpStage):
    """Rational L/M resampling via a single polyphase conv
    (reference FractionalDecimator, csdr/chain/selector.py + analog.py:66)."""

    def __init__(self, interpolation: int, decimation: int, transition_bw: float | None = None,
                 taps: np.ndarray | None = None, name: str = "fractional"):
        self.name = name
        self.interpolation = int(interpolation)
        self.decimation = int(decimation)
        if taps is None:
            # anti-alias at the upsampled rate: cutoff 0.5/max(L,M)
            cut = 0.45 / max(self.interpolation, self.decimation)
            tbw = transition_bw if transition_bw is not None else cut * 0.3
            taps = firdes.lowpass_taps(cut, tbw) * self.interpolation
        self.bank, self.tail_len, self.delay_groups = fir.polyphase_bank(
            taps, self.interpolation, self.decimation)

    def ratio(self, in_spec):
        return Fraction(self.interpolation, self.decimation)

    def divisor(self, in_spec):
        return self.decimation

    def _out_spec(self, in_spec):
        return in_spec.with_rate(in_spec.rate * self.interpolation / self.decimation)

    def init_state(self, batch_shape=()):
        return fir.resample_init(self.tail_len, batch_shape,
                                 complex_input=self.in_spec.format.is_complex)

    def apply(self, state, params, x):
        state, y = fir.resample_apply(state, self.bank, x,
                                      self.interpolation, self.decimation)
        return state, y, {}

    def signature(self):
        return ("fractional", self.interpolation, self.decimation, digest(self.bank))


# --------------------------------------------------------------- bandpass --
class BandpassStage(OpStage):
    """Live-tunable FFT bandpass (reference Bandpass use_fft=True,
    csdr/chain/selector.py:115-117; transition 320/outRate)."""

    def __init__(self, low_cut_hz=0.0, high_cut_hz=0.0, name: str = "bandpass"):
        self.name = name
        self._low = np.asarray(low_cut_hz, np.float64)
        self._high = np.asarray(high_cut_hz, np.float64)
        self._response = None

    def set_bandpass(self, low_cut_hz, high_cut_hz):
        """Scalars (shared) or per-channel arrays (each listener drags their
        own passband; the response param becomes (C, nfft)).

        No-op when the edges are value-identical to the current ones: a
        bank's monolithic param rebuild pushes ALL control arrays on any
        retune, and redesigning + re-uploading an unchanged (C, nfft)
        response (tens of MB for big banks) would otherwise dominate
        retune-churn workloads."""
        # COPY: callers (banks) mutate their control arrays in place and
        # re-push; storing the caller's array would alias it and make the
        # equality check below always true (nothing would ever recompute)
        low = np.array(low_cut_hz, np.float64, copy=True)
        high = np.array(high_cut_hz, np.float64, copy=True)
        if (low.shape == self._low.shape and high.shape == self._high.shape
                and np.array_equal(low, self._low)
                and np.array_equal(high, self._high)):
            return
        self._low = low
        self._high = high
        self._bump()
        if hasattr(self, "in_spec"):  # pre-plan: plan() will compute it
            self._recompute()

    def set_slot_bandpass(self, slot: int, low_cut_hz: float, high_cut_hz: float):
        lo, hi = np.array(self._low, copy=True), np.array(self._high, copy=True)
        lo[slot], hi[slot] = low_cut_hz, high_cut_hz
        self.set_bandpass(lo, hi)

    def plan(self, in_spec, block):
        self.transition = 320.0 / in_spec.rate
        self.ntaps = firdes.bandpass_ntaps(self.transition)
        self.nfft = bandpass.plan_nfft(self.ntaps, block)
        out = super().plan(in_spec, block)
        self._recompute()
        return out

    def _recompute(self):
        rate = self.in_spec.rate
        lo = np.clip(np.atleast_1d(self._low) / rate, -0.4999, 0.4999)
        hi = np.clip(np.atleast_1d(self._high) / rate,
                     lo + self.transition, 0.49999)
        rows = firdes.bandpass_response_batch(lo, hi, self.transition,
                                              self.nfft)
        self._response = rows[0] if self._low.ndim == 0 else rows
        self._response_packed = None     # device cache, rebuilt lazily

    def init_state(self, batch_shape=()):
        return bandpass.bandpass_init(self.ntaps, batch_shape)

    def params(self):
        # complex params can't cross the jit boundary on tunnel backends —
        # ship the response as (..., nfft, 2) float32 (runtime/chain.py).
        # The packed response is cached as a DEVICE array: for a 1024-
        # channel bank it is tens of MB, and re-uploading it every block
        # would dominate the step time over a tunneled transport.
        if getattr(self, "_response_packed", None) is None:
            r = np.asarray(self._response)
            self._response_packed = jnp.asarray(
                np.stack([r.real, r.imag], axis=-1).astype(np.float32))
        return self._response_packed

    def apply(self, state, params, x):
        import jax as _jax
        response = _jax.lax.complex(params[..., 0], params[..., 1])
        state, y = bandpass.bandpass_apply(state, response, x, self.ntaps, self.nfft)
        return state, y, {}

    def signature(self):
        return ("bandpass", self.ntaps, self.nfft)


# ---------------------------------------------------------------- squelch --
class SquelchStage(OpStage):
    """Power squelch + s-meter tap (reference Squelch,
    csdr/chain/selector.py:104-130: 16 measurements/s)."""

    MEASUREMENTS_PER_S = 16

    def __init__(self, level_db=-150.0, name: str = "squelch"):
        self.name = name
        self._level = level_db

    def set_level(self, level_db):
        """Scalar or per-channel array of thresholds (dB)."""
        self._level = level_db
        self._bump()

    def plan(self, in_spec, block):
        # soft cadence: nearest block divisor to rate/16 (see best_chunk —
        # a hard divisor would explode the chain block LCM)
        self.window = best_chunk(
            block, int(round(in_spec.rate / self.MEASUREMENTS_PER_S)))
        return super().plan(in_spec, block)

    def init_state(self, batch_shape=()):
        return squelch.squelch_init(batch_shape)

    def params(self):
        return jnp.asarray(self._level, jnp.float32)

    def apply(self, state, params, x):
        state, y, power_db = squelch.squelch_apply(state, params, x, self.window)
        return state, y, {"power_db": power_db}

    def signature(self):
        return ("squelch", self.window)


# ----------------------------------------------------------------- demods --
class FmDemodStage(OpStage):
    """Quadrature FM discriminator (reference FmDemod, csdr/chain/analog.py:41)."""

    name = "fm_demod"

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.FLOAT)

    def init_state(self, batch_shape=()):
        return demod.fm_init(batch_shape)

    def apply(self, state, params, x):
        state, y = demod.fm_demod(state, x)
        return state, y, {}

    def signature(self):
        return ("fm_demod",)


class AmDemodStage(OpStage):
    """Envelope detector (reference AmDemod, csdr/chain/analog.py:17)."""

    name = "am_demod"

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.FLOAT)

    def apply(self, state, params, x):
        return state, demod.am_demod(x), {}

    def signature(self):
        return ("am_demod",)


class RealPartStage(OpStage):
    """SSB detector (reference RealPart, csdr/chain/analog.py:125)."""

    name = "real_part"

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.FLOAT)

    def apply(self, state, params, x):
        return state, demod.real_part(x), {}

    def signature(self):
        return ("real_part",)


class SyncAmStage(OpStage):
    """Carrier-locked AM (reference Afc+AmDemod 'SAm', csdr/chain/analog.py:149)."""

    name = "sync_am"

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.FLOAT)

    def init_state(self, batch_shape=()):
        return demod.sync_am_init(batch_shape)

    def apply(self, state, params, x):
        state, y = demod.sync_am_demod(state, x)
        return state, y, {}

    def signature(self):
        return ("sync_am",)


class LimitStage(OpStage):
    """Clipper (reference Limit, csdr/chain/analog.py:60)."""

    name = "limit"

    def __init__(self, max_amplitude: float = 1.0):
        self.max_amplitude = float(max_amplitude)

    def apply(self, state, params, x):
        return state, demod.limit(x, self.max_amplitude), {}

    def signature(self):
        return ("limit", self.max_amplitude)


class GainStage(OpStage):
    name = "gain"

    def __init__(self, g: float):
        self._g = float(g)

    def set_gain(self, g: float):
        self._g = float(g)
        self._bump()

    def params(self):
        return jnp.float32(self._g)

    def apply(self, state, params, x):
        return state, x * params, {}

    def signature(self):
        return ("gain",)


# --------------------------------------------------------------- IIR-ish ---
class DcBlockStage(OpStage):
    """Single-pole DC blocker (reference DcBlock, csdr/chain/analog.py:18)."""

    name = "dc_block"

    def plan(self, in_spec, block):
        self.coeffs = iir.dc_block_coeffs(in_spec.rate)
        return super().plan(in_spec, block)

    def init_state(self, batch_shape=()):
        return iir.first_order_init(batch_shape)

    def apply(self, state, params, x):
        b0, b1, a1 = self.coeffs
        state, y = iir.first_order_apply(state, b0, b1, a1, x)
        return state, y, {}

    def signature(self):
        return ("dc_block", self.coeffs)


class DeemphasisStage(OpStage):
    """One-pole de-emphasis (reference {Nfm,Wfm}Deemphasis,
    csdr/chain/analog.py:43,67; tau per DeemphasisTauChain)."""

    def __init__(self, tau: float, name: str = "deemphasis"):
        self.name = name
        self.tau = float(tau)

    def plan(self, in_spec, block):
        self.coeffs = iir.deemphasis_coeffs(in_spec.rate, self.tau)
        return super().plan(in_spec, block)

    def init_state(self, batch_shape=()):
        return iir.first_order_init(batch_shape)

    def apply(self, state, params, x):
        b0, b1, a1 = self.coeffs
        state, y = iir.first_order_apply(state, b0, b1, a1, x)
        return state, y, {}

    def signature(self):
        return ("deemphasis", self.coeffs)


class AgcStage(OpStage):
    """Chunked AGC (reference Agc FAST/SLOW, csdr/chain/analog.py:13-15)."""

    def __init__(self, profile: agc.AgcProfile = agc.FAST, name: str = "agc"):
        self.name = name
        self.profile = profile
        self.chunk = agc.CHUNK

    def plan(self, in_spec, block):
        # soft cadence (see best_chunk): ~50-sample chunks, adapted so the
        # AGC never constrains the chain's block LCM
        self.chunk = best_chunk(block, agc.CHUNK)
        return super().plan(in_spec, block)

    def init_state(self, batch_shape=()):
        return agc.agc_init(self.profile, batch_shape)

    def apply(self, state, params, x):
        state, y = agc.agc_apply(state, self.profile, x, self.chunk)
        return state, y, {}

    def signature(self):
        return ("agc", self.profile, self.chunk)


# -------------------------------------------------------------- waterfall --
class WaterfallStage(OpStage):
    """Fft → LogAveragePower → FftSwap (reference csdr/chain/fft.py:5-96).

    Terminal stage: output is (..., rows, fft_size) float32 dB rows.
    Works with ANY block size (divisor 1): plan() fixes rows-per-block ≈
    fps·block/rate and spaces the averaged frames uniformly inside the
    block (cross-block jitter < one frame — invisible on a waterfall),
    so waterfall framing never inflates the chain's block LCM.
    """

    def __init__(self, fft_size: int, fps: float, add_db: float = -70.0,
                 overlap_factor: float = 0.3, name: str = "waterfall",
                 compress: bool = False):
        self.name = name
        self.fft_size = int(fft_size)
        self.fps = float(fps)
        self.add_db = float(add_db)
        self.overlap_factor = overlap_factor
        # compress=True: ADPCM-encode rows INSIDE the program (reference
        # FftAdpcm lives in the shared chain too, csdr/chain/fft.py:44).
        # Device→host readback is the scarce resource on tunnel-attached
        # chips: compressed rows are 8× smaller AND skip the separate
        # host-side encode round trip that cost ~30 ms/block.  Output is
        # int32 words; the first ``wire_bytes_per_row`` bytes of each row
        # are the wire payload.
        self.compress = bool(compress)
        pad = adpcm.COMPRESS_FFT_PAD_N
        self.wire_bytes_per_row = (self.fft_size + pad + 1) // 2

    def plan(self, in_spec, block):
        self.in_spec = in_spec
        self.block = block
        self.rows = max(1, round(self.fps * block / in_spec.rate))
        # average as many whole frames per row as fit (reference
        # LogAveragePower semantics, csdr/chain/fft.py:75-85)
        self.averages = max(1, block // (self.fft_size * self.rows))
        nframes = self.rows * self.averages
        stride = block // nframes
        self.ends = ((np.arange(nframes) + 1) * stride).astype(np.int64)
        self.window = fftops.hann_window(self.fft_size)
        out_rate = in_spec.rate * self.rows / block
        return in_spec.with_format(Format.FLOAT).with_rate(out_rate), self.rows

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.FLOAT)

    def init_state(self, batch_shape=()):
        return fftops.fft_init(self.fft_size, self.fft_size, batch_shape)

    def apply(self, state, params, x):
        import jax
        state, p = fftops.fft_power_at(state, jnp.asarray(self.window), x,
                                       self.fft_size, self.ends)
        rows = fftops.log_average(p, self.averages, self.add_db)
        rows = fftops.fft_swap(rows)
        if not self.compress:
            return state, rows, {}
        # reference wire format: dB×100 int16, 10 warm-up pad samples,
        # fresh codec per row (client resets per message,
        # htdocs/openwebrx.js:1124-1128); samples padded so the byte count
        # is int32-aligned, host trims to wire_bytes_per_row
        s = jnp.clip(rows * 100.0, -32768, 32767).astype(jnp.int16)
        pad = jnp.repeat(s[..., :1], adpcm.COMPRESS_FFT_PAD_N, axis=-1)
        s = jnp.concatenate([pad, s], axis=-1)
        extra = (-s.shape[-1]) % 8
        if extra:
            s = jnp.concatenate(
                [s, jnp.repeat(s[..., -1:], extra, axis=-1)], axis=-1)
        _, (bytes_, _stride) = adpcm.adpcm_encode_seq(
            adpcm.adpcm_init(s.shape[:-1]), s)
        words = jax.lax.bitcast_convert_type(
            bytes_.reshape(bytes_.shape[:-1] + (bytes_.shape[-1] // 4, 4)),
            jnp.int32)
        return state, words, {}

    def signature(self):
        return ("waterfall", self.fft_size, self.rows, self.averages,
                self.add_db, self.compress)


# ------------------------------------------------------------------- rds --
class RdsTapStage(OpStage):
    """Pass-through RDS tap inside the WFM chain (reference RdsChain meta
    tap feeding redsea, ``csdr/chain/toolbox.py:100``; here the decode is
    native — ``openwebrx_tpu/digimodes/rds.py``).

    The 57 kHz RDS subcarrier of the FM composite is mixed to baseband,
    low-passed and decimated by 16 ON DEVICE for the whole channel bank at
    once, and emitted as the ``rds`` aux output (complex64,
    rate/16 ≈ 15.6 kHz) for the host bit/group decoder; the composite
    passes through unchanged.
    """

    DECIMATION = 16

    def __init__(self, name: str = "rds_tap"):
        self.name = name

    def divisor(self, in_spec):
        return self.DECIMATION

    def plan(self, in_spec, block):
        out = super().plan(in_spec, block)
        # ±3 kHz around the subcarrier comfortably holds the ±2.4 kHz
        # RDS spectrum and stays clear of 53 kHz stereo-difference edge
        self.taps = firdes.lowpass_taps(3000.0 / in_spec.rate,
                                        2400.0 / in_spec.rate)
        self.rate_fixed = nco.rate_to_fixed(-57000.0 / in_spec.rate)
        return out

    def init_state(self, batch_shape=()):
        return (nco.shift_init(batch_shape),
                fir.fir_init(len(self.taps), batch_shape, complex_input=True))

    def apply(self, state, params, x):
        phase, tail = state
        phase, mixed = nco.shift_apply(
            phase, jnp.asarray(self.rate_fixed), x.astype(jnp.complex64))
        tail, bb = fir.fir_apply(tail, self.taps, mixed, self.DECIMATION)
        return (phase, tail), x, {"rds": bb}

    def signature(self):
        return ("rds_tap", self.DECIMATION, digest(self.taps))


# ------------------------------------------------------------ client audio --
class NoiseFilterStage(OpStage):
    """Spectral NR (reference NoiseFilter, csdr/chain/clientaudio.py:14).

    The threshold is a per-channel traced param; −100 dB ≈ passthrough, so
    banks keep one structure and each listener toggles NR independently.
    """

    name = "noise_filter"

    def __init__(self, threshold_db=-100.0):
        self._threshold = threshold_db
        from openwebrx_tpu.ops import noisefilter
        self.hop = noisefilter.DEFAULT_HOP   # plan() adapts to the block

    def set_threshold(self, threshold_db):
        """Scalar or per-channel array (dB); ≤ −100 disables."""
        self._threshold = threshold_db
        self._bump()

    def plan(self, in_spec, block):
        # soft cadence (see best_chunk): ~5 ms hop, adapted to the block
        from openwebrx_tpu.ops import noisefilter
        self.hop = best_chunk(block, noisefilter.DEFAULT_HOP)
        return super().plan(in_spec, block)

    def init_state(self, batch_shape=()):
        from openwebrx_tpu.ops import noisefilter
        return noisefilter.nr_init(batch_shape, self.hop)

    def params(self):
        return jnp.asarray(self._threshold, jnp.float32)

    def apply(self, state, params, x):
        from openwebrx_tpu.ops import noisefilter
        state, y = noisefilter.nr_apply(state, params, x, self.hop)
        return state, y, {}

    def signature(self):
        return ("noise_filter", self.hop)


class AdpcmEncodeStage(OpStage):
    """IMA ADPCM encode (reference AdpcmEncoder(sync=True),
    csdr/chain/clientaudio.py:34).  Input float [−1,1]; output y is a tuple
    (bytes uint8 (..., B/2), stride_states int32 (..., B/(2·STRIDE))) — the
    state after every STATE_STRIDE-th byte, packed (pred << 16) | index,
    which is exactly what the host SyncFramer needs to splice sync headers
    (cuts land only on stride multiples).  Per-byte codec state never
    leaves the device (it was 80 % of the audio readback volume)."""

    name = "adpcm"

    def divisor(self, in_spec):
        # bytes (B/2) must be a multiple of STATE_STRIDE for the state
        # export (and of 4 for the int32 boundary packing)
        return 2 * adpcm.STATE_STRIDE

    def ratio(self, in_spec):
        return Fraction(1, 2)

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.CHAR).with_rate(in_spec.rate / 2)

    def init_state(self, batch_shape=()):
        return adpcm.adpcm_init(batch_shape)

    def apply(self, state, params, x):
        samples = convert.float_to_short(x)
        state, out = adpcm.adpcm_encode(state, samples)
        return state, out, {}

    def signature(self):
        return ("adpcm_encode",)


class FloatToShortStage(OpStage):
    """Reference Convert FLOAT→SHORT (csdr/chain/clientaudio.py:12)."""

    name = "to_short"

    def _out_spec(self, in_spec):
        return in_spec.with_format(Format.SHORT)

    def apply(self, state, params, x):
        return state, convert.float_to_short(x), {}

    def signature(self):
        return ("to_short",)


# ------------------------------------------------------- block size helper --
def _flatten(stage) -> list:
    if isinstance(stage, Chain):
        out = []
        for w in stage.workers:
            out.extend(_flatten(w))
        return out
    return [stage]


def block_requirement(stages_or_chain, in_spec: StreamSpec) -> int:
    """The divisor every block size must be a multiple of for this chain.

    For a stage at cumulative ratio r requiring its input divisible by d:
    block·r ≡ 0 (mod d) ⇔ block is a multiple of denominator(r/d).
    """
    if isinstance(stages_or_chain, Chain):
        stages = _flatten(stages_or_chain)
    else:
        stages = [s for w in stages_or_chain for s in _flatten(w)]
    req = 1
    r = Fraction(1)
    spec = in_spec
    for s in stages:
        d = s.divisor(spec)
        den = (r / d).denominator
        req = req * den // gcd(req, den)
        r *= s.ratio(spec)
        spec = s._out_spec(spec)
    return req


def plan_block_size(stages_or_chain, in_spec: StreamSpec, target_seconds: float,
                    extra_requirement: int = 1) -> int:
    """Smallest block ≈ target_seconds·rate satisfying the chain's (and any
    extra) divisibility requirements."""
    req = block_requirement(stages_or_chain, in_spec)
    req = req * extra_requirement // gcd(req, extra_requirement)
    want = max(1, int(round(in_spec.rate * target_seconds)))
    return ((want + req - 1) // req) * req
