"""Selector: per-channel tuner (shift → decimate → bandpass → squelch).

Reference: ``csdr/chain/selector.py:89-248`` — ``Shift`` (rate =
−offset/inputRate, :132-140), ``Decimator`` (integer FIR + optional
fractional stage, transition 0.15·out/in), optional FFT ``Bandpass``
(transition 320/outRate), power-reporting ``Squelch`` (16 meas/s).

All the live controls of the reference Selector exist here as traced
parameters: retune, passband drag and squelch slider never recompile.
"""

from __future__ import annotations

from fractions import Fraction

from openwebrx_tpu.models.stages import (
    ShiftStage, FirDecimateStage, FractionalDecimatorStage, BandpassStage,
    SquelchStage,
)
from openwebrx_tpu.runtime.chain import Chain


def plan_decimation(in_rate: float, out_rate: float):
    """Integer decimation + rational cleanup stage.

    The reference Decimator (csdr/chain/selector.py:21-35) maximizes the
    integer part (cheapest on a CPU running the FIR at the lowest possible
    intermediate rate), leaving a fractional stage like 1023/1024.  Under
    jit that denominator becomes a block-divisibility requirement, so here
    the split minimizes the fractional DENOMINATOR instead: out/in = L/M
    reduced, the fractional stage is L/m for the smallest divisor m of M
    with m ≥ L, and the integer stage is M//m.  Same passband (the FIR is
    designed to the final Nyquist either way); tiny block LCMs.
    """
    if out_rate > in_rate:
        raise ValueError(f"cannot decimate {in_rate} → {out_rate}")
    # exact ratio when the rates are rational (the float division
    # out/in + limit_denominator can mangle e.g. 125/24576 into 23/4522,
    # silently shifting the IF rate by ~1 Hz)
    total = (Fraction(out_rate).limit_denominator(10 ** 6)
             / Fraction(in_rate).limit_denominator(10 ** 6))
    if total.denominator > 10 ** 6:
        total = total.limit_denominator(10000)
    L, M = total.numerator, total.denominator
    m = M
    d = 1
    while d * d <= M:
        if M % d == 0:
            if d >= L:
                m = min(m, d)
            if M // d >= L:
                m = min(m, M // d)
        d += 1
    return M // m, Fraction(L, m)


class Selector(Chain):
    def __init__(self, in_rate: float, out_rate: float, with_squelch: bool = True,
                 name: str = "selector"):
        self.in_rate = float(in_rate)
        self.out_rate = float(out_rate)
        d, frac = plan_decimation(in_rate, out_rate)
        self.shift = ShiftStage()
        workers = [self.shift]
        if d > 1:
            # exact reference design constants (csdr/chain/selector.py:21-35):
            # transition 0.15·out/in, cutoff precompensated to the FINAL
            # output Nyquist so the fractional stage needs no second filter
            workers.append(FirDecimateStage(
                d, transition_bw=0.15 * self.out_rate / self.in_rate,
                cutoff=0.5 * self.out_rate / self.in_rate))
        if frac != 1:
            workers.append(FractionalDecimatorStage(frac.numerator, frac.denominator))
        self.bandpass = BandpassStage(-out_rate / 2 * 0.95, out_rate / 2 * 0.95)
        workers.append(self.bandpass)
        self.squelch = SquelchStage() if with_squelch else None
        if self.squelch is not None:
            workers.append(self.squelch)
        super().__init__(workers, name=name)

    # -- live controls (reference Selector API, csdr/chain/selector.py) ----
    def set_frequency_offset(self, offset_hz: float):
        self.shift.set_rate(-offset_hz / self.in_rate)

    def set_bandpass(self, low_cut_hz: float, high_cut_hz: float):
        self.bandpass.set_bandpass(low_cut_hz, high_cut_hz)

    def set_squelch_level(self, level_db: float):
        if self.squelch is not None:
            self.squelch.set_level(level_db)


class SecondarySelector(Chain):
    """Digimode sub-tuner inside the audio channel: shift + narrow bandpass
    (reference csdr/chain/selector.py:217-244)."""

    def __init__(self, sample_rate: float, bandwidth: float, name: str = "secondary_selector"):
        self.sample_rate = float(sample_rate)
        self.shift = ShiftStage()
        self.bandpass = BandpassStage(-bandwidth / 2, bandwidth / 2)
        super().__init__([self.shift, self.bandpass], name=name)

    def set_frequency_offset(self, offset_hz: float):
        self.shift.set_rate(-offset_hz / self.sample_rate)
