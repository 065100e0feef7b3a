"""Analog demodulator chains (reference ``csdr/chain/analog.py:11-182``).

Each chain mirrors the reference wiring and declares its IF-rate policy the
way the reference does with FixedIfSampleRateChain / FixedAudioRateChain
capability mixins (``csdr/chain/demodulator.py:6-88``).
"""

from __future__ import annotations

from openwebrx_tpu.models.stages import (
    AmDemodStage, FmDemodStage, RealPartStage, SyncAmStage, LimitStage,
    DcBlockStage, DeemphasisStage, AgcStage, FractionalDecimatorStage,
    GainStage,
)
from openwebrx_tpu.ops import agc
from openwebrx_tpu.runtime.chain import Chain

# de-emphasis time constants (reference DeemphasisTauChain defaults:
# 50 µs EU / 75 µs US for WFM; NFM uses a shorter tau)
NFM_TAU = 150e-6
WFM_TAU = 50e-6


class BaseDemodulatorChain(Chain):
    """Capability flags matching the reference mixins
    (csdr/chain/demodulator.py)."""

    fixed_if_rate: float | None = None    # FixedIfSampleRateChain
    fixed_audio_rate: float | None = None  # FixedAudioRateChain

    def get_if_rate(self, audio_rate: float) -> float:
        return self.fixed_if_rate or audio_rate

    def supports_squelch(self) -> bool:
        return True


class Am(BaseDemodulatorChain):
    """AmDemod → DcBlock → Agc (reference csdr/chain/analog.py:11-26)."""

    def __init__(self, name: str = "am"):
        super().__init__([AmDemodStage(), DcBlockStage(), AgcStage(agc.SLOW)], name=name)


class RawAm(BaseDemodulatorChain):
    """AmDemod → Agc, no DC block (reference RawAm — carrier level preserved
    for downstream digimodes)."""

    def __init__(self, name: str = "raw_am"):
        super().__init__([AmDemodStage(), AgcStage(agc.SLOW)], name=name)


class NFm(BaseDemodulatorChain):
    """FmDemod → Limit → NfmDeemphasis → Agc (reference csdr/chain/analog.py:31-57)."""

    def __init__(self, if_rate: float = 48000, name: str = "nfm"):
        self._if_rate = float(if_rate)
        super().__init__([
            FmDemodStage(),
            LimitStage(),
            DeemphasisStage(NFM_TAU, name="nfm_deemphasis"),
            AgcStage(agc.FAST),
        ], name=name)

    def get_if_rate(self, audio_rate: float) -> float:
        return max(self._if_rate, audio_rate)


class WFm(BaseDemodulatorChain):
    """FmDemod → Limit → [RdsTap] → FractionalDecimator(IF→audio) →
    WfmDeemphasis (reference csdr/chain/analog.py:59-101; fixed IF
    250 kHz).  The RDS tap (reference RdsChain) emits the 57 kHz
    subcarrier as a decimated complex aux stream decoded natively on
    host (digimodes/rds.py) — no redsea binary."""

    fixed_if_rate = 250000.0

    def __init__(self, audio_rate: float = 48000, tau: float = WFM_TAU,
                 rds: bool = True, name: str = "wfm"):
        from fractions import Fraction
        from openwebrx_tpu.models.stages import RdsTapStage
        frac = Fraction(int(audio_rate), int(self.fixed_if_rate))
        stages = [
            FmDemodStage(),
            LimitStage(),
        ]
        if rds:
            stages.append(RdsTapStage())
        stages += [
            FractionalDecimatorStage(frac.numerator, frac.denominator),
            DeemphasisStage(tau, name="wfm_deemphasis"),
        ]
        super().__init__(stages, name=name)
        self.fixed_audio_rate = float(audio_rate)


class Ssb(BaseDemodulatorChain):
    """RealPart → Agc (reference csdr/chain/analog.py:121-133).  The
    Selector's asymmetric bandpass has already picked the sideband."""

    def __init__(self, name: str = "ssb"):
        super().__init__([RealPartStage(), GainStage(2.0), AgcStage(agc.SLOW)], name=name)


class SAm(BaseDemodulatorChain):
    """Synchronous AM: carrier-locked coherent detector → DcBlock → Agc
    (reference SAm with Afc, csdr/chain/analog.py:137-170)."""

    def __init__(self, name: str = "sam"):
        super().__init__([SyncAmStage(), DcBlockStage(), AgcStage(agc.SLOW)], name=name)


class Empty(BaseDemodulatorChain):
    """Pass-through placeholder (reference Empty / DummyDemodulator,
    csdr/chain/analog.py:174-182, csdr/chain/dummy.py)."""

    def __init__(self, name: str = "empty"):
        super().__init__([], name=name)
