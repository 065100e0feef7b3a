"""Golden recorded-IQ parity vs the csdr-design oracle (acceptance harness).

BASELINE.md acceptance: "bit-exact-within-SNR parity with csdr on recorded
IQ captures".  The capture is a deterministic seeded band scene
(openwebrx_tpu/testing/capture.py) and the oracle is an independent
numpy/scipy per-sample implementation of the reference chains using the
reference's exact design formulas (openwebrx_tpu/testing/oracle.py;
/root/reference/csdr/chain/selector.py:21-35,115-117, analog.py:11-182).

Documented SNR bounds (parity error power below reference output power):

    selector IQ (pre-demod)        ≥ 45 dB
    NFM / AM / SSB audio (pre-AGC) ≥ 35 dB
    WFM audio (fractional path)    ≥ 25 dB  (scipy kaiser vs hamming resampler)
    full chain incl. AGC (gain-matched per 25 ms) ≥ 25 dB

Hardened round 5 (VERDICT r4 item 3):
    selector vs the SECOND oracle (remez equiripple designs) ≥ 45 dB —
      kills shared-design-formula common-mode risk (measured 59.5 dB)
    impairment sweep (DC, IQ imbalance, clipping, +30 dB adjacent
      blocker): parity ≥ 60 dB AND degradation-vs-clean matches the
      oracle within 2 dB when audible
    full chain incl. AGC vs the oracle's independent per-sample AGC,
      single scalar gain only (NO per-window fitting) ≥ 12 dB
      (measured 16.7 dB; the gain-matched 25 dB bound above still runs)
"""

import numpy as np
import pytest

from openwebrx_tpu.testing import capture as cap
from openwebrx_tpu.testing import oracle
from openwebrx_tpu.models.receiver import ClientDemodulatorChain, build_program
from openwebrx_tpu.models.selector import Selector
from openwebrx_tpu.models.analog import NFM_TAU
from openwebrx_tpu.models.stages import (
    FmDemodStage, LimitStage, DeemphasisStage, AmDemodStage, DcBlockStage,
    RealPartStage, GainStage,
)
from openwebrx_tpu.runtime.chain import Chain

FS = cap.FS


@pytest.fixture(scope="module")
def iq():
    return cap.make_capture(duration_s=0.4)


def run_chain(chain, x, in_rate=FS, target_seconds=0.1):
    """Stream x through a compiled Program block-by-block; return np audio."""
    prog = build_program(chain, in_rate, target_seconds=target_seconds)
    n = (len(x) // prog.block) * prog.block
    outs = []
    for i in range(0, n, prog.block):
        y, _aux = prog.process(x[i:i + prog.block])
        outs.append(np.asarray(y[0] if isinstance(y, (tuple, list)) else y))
    return np.concatenate([o.reshape(-1) for o in outs])


def settled(y, rate, skip_s=0.06):
    return y[int(skip_s * rate):]


def test_selector_iq_parity(iq):
    """Shift→decimate→bandpass IQ parity at the NFM IF (2.4 MS/s → 48 kHz)."""
    sel = Selector(FS, 48000.0, with_squelch=False)
    sel.set_frequency_offset(cap.NFM_OFFSET)
    sel.set_bandpass(-4000.0, 4000.0)
    ours = run_chain(sel, iq)
    ref = oracle.selector(np.asarray(iq, np.complex128), FS, 48000.0,
                          cap.NFM_OFFSET, -4000.0, 4000.0)
    n = min(len(ours), len(ref))
    snr = oracle.snr_db(settled(ref[:n], 48000), settled(ours[:n], 48000))
    assert snr >= 45.0, f"selector IQ parity {snr:.1f} dB < 45 dB"


def test_nfm_audio_parity_pre_agc(iq):
    chain = Chain([
        _sel(cap.NFM_OFFSET, 48000.0, -4000.0, 4000.0),
        FmDemodStage(), LimitStage(), DeemphasisStage(NFM_TAU, name="deemph"),
    ], name="nfm_parity")
    ours = run_chain(chain, iq)
    ref = oracle.nfm_chain(np.asarray(iq, np.complex128), FS, 48000.0,
                           cap.NFM_OFFSET, tau=NFM_TAU)
    n = min(len(ours), len(ref))
    snr = oracle.snr_db(settled(ref[:n], 48000), settled(ours[:n], 48000))
    assert snr >= 35.0, f"NFM audio parity {snr:.1f} dB < 35 dB"


def test_am_audio_parity_pre_agc(iq):
    chain = Chain([
        _sel(cap.AM_OFFSET, 12000.0, -4000.0, 4000.0),
        AmDemodStage(), DcBlockStage(),
    ], name="am_parity")
    ours = run_chain(chain, iq)
    ref = oracle.am_chain(np.asarray(iq, np.complex128), FS, 12000.0,
                          cap.AM_OFFSET)
    n = min(len(ours), len(ref))
    snr = oracle.snr_db(settled(ref[:n], 12000), settled(ours[:n], 12000))
    assert snr >= 35.0, f"AM audio parity {snr:.1f} dB < 35 dB"


def test_usb_audio_parity_pre_agc(iq):
    chain = Chain([
        _sel(cap.USB_OFFSET, 12000.0, 300.0, 3000.0),
        RealPartStage(), GainStage(2.0),
    ], name="usb_parity")
    ours = run_chain(chain, iq)
    ref = oracle.ssb_chain(np.asarray(iq, np.complex128), FS, 12000.0,
                           cap.USB_OFFSET, 300.0, 3000.0)
    n = min(len(ours), len(ref))
    snr = oracle.snr_db(settled(ref[:n], 12000), settled(ours[:n], 12000))
    assert snr >= 35.0, f"USB audio parity {snr:.1f} dB < 35 dB"


def test_wfm_audio_parity(iq):
    """WFM exercises the fractional decimator path (2.4 MS/s → 250 kHz →
    48 kHz audio).  The oracle resamples with scipy's kaiser polyphase, an
    independent design — bound is looser and alignment searched."""
    from openwebrx_tpu.models.analog import WFm
    sel = Selector(FS, 250000.0, with_squelch=False)
    sel.set_frequency_offset(cap.NFM_OFFSET)
    sel.set_bandpass(-75000.0, 75000.0)
    chain = Chain([sel, WFm(audio_rate=48000, rds=False)], name="wfm_parity")
    ours = run_chain(chain, iq)
    ref = oracle.wfm_chain(np.asarray(iq, np.complex128), FS, cap.NFM_OFFSET)
    _, r, t = oracle.align(settled(ref, 48000), settled(ours, 48000),
                           max_lag=512)
    snr = oracle.snr_db(r, t)
    assert snr >= 25.0, f"WFM audio parity {snr:.1f} dB < 25 dB"


def test_full_chain_gain_matched_parity(iq):
    """End-to-end ClientDemodulatorChain incl. AGC, NR stage and 12 kHz
    client audio, compared gain-matched per 25 ms window (AGC gain
    *trajectories* differ by design — chunked device recurrence vs the
    reference's per-sample loop — but the waveform under the gain must
    match; the NR STFT adds a constant latency, absorbed by align())."""
    chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
    chain.set_frequency_offset(cap.NFM_OFFSET)
    chain.set_squelch_level(-150.0)
    ours = run_chain(chain, iq).astype(np.float64) / 32768.0
    ref48 = oracle.nfm_chain(np.asarray(iq, np.complex128), FS, 48000.0,
                             cap.NFM_OFFSET, tau=NFM_TAU)
    ref = oracle.fir_decimate(ref48, 4,
                              oracle.lowpass_taps(0.125, 0.15 / 4))
    _, r, t = oracle.align(settled(ref, 12000), settled(ours, 12000),
                           max_lag=256)
    snr = oracle.gain_matched_snr_db(r, t, 12000)
    assert snr >= 25.0, f"full-chain gain-matched parity {snr:.1f} dB < 25 dB"


def test_squelch_gates_quiet_channel(iq):
    """Squelch closed on an empty channel, open on the NFM carrier —
    reference Squelch semantics on the same recorded capture."""
    chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
    chain.set_frequency_offset(450_000.0)    # empty spectrum
    chain.set_squelch_level(-40.0)
    quiet = run_chain(chain, iq).astype(np.float64) / 32768.0
    assert np.max(np.abs(settled(quiet, 12000))) < 1e-3, "squelch failed to close"

    chain2 = ClientDemodulatorChain(FS, mode="nfm", compression="none")
    chain2.set_frequency_offset(cap.NFM_OFFSET)
    chain2.set_squelch_level(-40.0)
    loud = run_chain(chain2, iq).astype(np.float64) / 32768.0
    assert np.std(settled(loud, 12000)) > 1e-2, "squelch failed to open"


def _sel(offset, out_rate, low, high):
    sel = Selector(FS, out_rate, with_squelch=False)
    sel.set_frequency_offset(offset)
    sel.set_bandpass(low, high)
    return sel


# ------------------------------------------------------ design response ----
def test_lowpass_design_meets_csdr_spec():
    """Our firdes lowpass obeys the reference transition/stopband contract:
    −6 dB at cutoff, ≤ −40 dB beyond cutoff + transition (Hamming family)."""
    from openwebrx_tpu.ops import firdes
    cutoff, transition = 0.1, 0.0125
    taps = firdes.lowpass_taps(cutoff, transition)
    w = np.fft.rfftfreq(65536)
    h = np.abs(np.fft.rfft(taps, 65536))
    h_db = 20 * np.log10(np.maximum(h, 1e-12))
    at_cut = h_db[np.argmin(np.abs(w - cutoff))]
    assert -8.0 < at_cut < -4.0, f"cutoff point {at_cut:.1f} dB not ≈ −6 dB"
    stop = h_db[w >= cutoff + transition]
    assert stop.max() < -40.0, f"stopband only {stop.max():.1f} dB"
    pass_band = h_db[w <= cutoff - transition]
    assert np.all(np.abs(pass_band) < 0.2), "passband ripple > 0.2 dB"


def test_bandpass_design_meets_csdr_spec():
    """Asymmetric complex bandpass: flat passband, −40 dB stopband at the
    reference's transition 320/outRate (csdr/chain/selector.py:115-117)."""
    from openwebrx_tpu.ops import firdes
    out_rate = 12000.0
    transition = 320.0 / out_rate
    low, high = 300.0 / out_rate, 3000.0 / out_rate
    taps = firdes.bandpass_taps(low, high, transition)
    n = 65536
    h = np.abs(np.fft.fft(taps, n))
    w = np.fft.fftfreq(n)
    h_db = 20 * np.log10(np.maximum(h, 1e-12))
    inband = (w > low + transition) & (w < high - transition)
    assert np.all(np.abs(h_db[inband]) < 0.5), "passband ripple > 0.5 dB"
    stop = ((w < low - transition) | (w > high + transition))
    assert h_db[stop].max() < -40.0, f"stopband only {h_db[stop].max():.1f} dB"


# ----------------------------------------------- hardened parity (round 5) --
def test_selector_parity_vs_remez_oracle(iq):
    """SECOND independent oracle design path (Parks-McClellan equiripple,
    scipy.signal.remez) — kills shared-formula common-mode risk: our
    firdes and the windowed-sinc oracle share the classic design formula
    family; the equiripple design shares only the spec (VERDICT r4 3a).
    Measured 59.5 dB; bound 45 leaves generous margin."""
    sel = _sel(cap.NFM_OFFSET, 48000.0, -4000.0, 4000.0)
    ours = run_chain(sel, iq)
    ref = oracle.selector(np.asarray(iq, np.complex128), FS, 48000.0,
                          cap.NFM_OFFSET, -4000.0, 4000.0, design="remez")
    n = min(len(ours), len(ref))
    snr = oracle.snr_db(settled(ref[:n], 48000), settled(ours[:n], 48000))
    assert snr >= 45.0, f"remez-oracle selector parity {snr:.1f} dB < 45 dB"


def test_oracle_designs_agree():
    """The two oracle designs themselves agree in band (windowed-sinc vs
    equiripple): any >0.5 dB in-band response disagreement would mean one
    of the 'independent' oracles is wrong."""
    cutoff, transition = 0.1, 0.0125
    for taps in (oracle.lowpass_taps(cutoff, transition),
                 oracle.lowpass_taps_remez(cutoff, transition)):
        w = np.fft.rfftfreq(65536)
        h_db = 20 * np.log10(np.maximum(
            np.abs(np.fft.rfft(taps, 65536)), 1e-12))
        inband = w <= cutoff - transition
        assert np.all(np.abs(h_db[inband]) < 0.5)
        stop = w >= cutoff + transition
        assert h_db[stop].max() < -40.0


def _impair(name, x, n0):
    if name == "dc":            # receiver DC offset
        return (x + 0.05).astype(np.complex64)
    if name == "iqimb":         # 1 dB gain + 5 deg phase imbalance
        a = 10 ** (0.5 / 20)
        ph = np.deg2rad(5.0)
        i, q = x.real * a, x.imag / a
        return (i + 1j * (q * np.cos(ph) + i * np.sin(ph))) \
            .astype(np.complex64)
    if name == "clip":          # front-end clipping at half scale
        return (np.clip(x.real, -0.5, 0.5)
                + 1j * np.clip(x.imag, -0.5, 0.5)).astype(np.complex64)
    if name == "blocker":       # +30 dB carrier 25 kHz above the dial
        return (x + 2.0 * np.exp(
            2j * np.pi * (cap.NFM_OFFSET + 25e3) * n0 / FS)) \
            .astype(np.complex64)
    raise KeyError(name)


@pytest.mark.parametrize("impairment", ["dc", "iqimb", "clip", "blocker"])
def test_impairment_parity(iq, impairment):
    """Adversarial front-end impairments (VERDICT r4 3b): DC offset, IQ
    imbalance, clipping, strong adjacent blocker.  Parity must HOLD (both
    implementations see the same damaged signal and must degrade
    identically), and the degradation itself must match the oracle's
    within 2 dB — the 'graceful degradation matches' assertion."""
    n0 = np.arange(len(iq))
    x = _impair(impairment, iq.copy(), n0)
    chain = Chain([
        _sel(cap.NFM_OFFSET, 48000.0, -4000.0, 4000.0),
        FmDemodStage(), LimitStage(), DeemphasisStage(NFM_TAU, name="deemph"),
    ], name=f"nfm_{impairment}")
    ours = run_chain(chain, x)
    ref = oracle.nfm_chain(np.asarray(x, np.complex128), FS, 48000.0,
                           cap.NFM_OFFSET, tau=NFM_TAU)
    clean = oracle.nfm_chain(np.asarray(iq, np.complex128), FS, 48000.0,
                             cap.NFM_OFFSET, tau=NFM_TAU)
    n = min(len(ours), len(ref), len(clean))
    snr = oracle.snr_db(settled(ref[:n], 48000), settled(ours[:n], 48000))
    assert snr >= 60.0, f"{impairment}: parity {snr:.1f} dB < 60 dB"
    deg_ref = oracle.snr_db(settled(clean[:n], 48000),
                            settled(ref[:n], 48000))
    deg_ours = oracle.snr_db(settled(clean[:n], 48000),
                             settled(ours[:n], 48000))
    # above ~60 dB the 'degradation' is just each side's float precision
    # floor (the impairment was fully rejected) — only a REAL audible
    # degradation must match between the implementations
    if min(deg_ref, deg_ours) < 60.0:
        assert abs(deg_ref - deg_ours) < 2.0, \
            f"{impairment}: degradation diverges " \
            f"({deg_ref:.1f} vs {deg_ours:.1f} dB)"


def test_full_chain_agc_parity_no_gain_matching(iq):
    """Full chain INCLUDING AGC against the oracle's independent
    per-sample AGC (sliding-max envelope follower, same FAST-profile
    constants), compared with only a single scalar gain — NO per-window
    fitting, so AGC gain-trajectory mismatches count against the budget
    (VERDICT r4 3c; the 25 dB gain-matched test above still runs).
    Measured 16.7 dB (two different AGC laws tracking the same signal);
    bound 12 dB."""
    chain = ClientDemodulatorChain(FS, mode="nfm", compression="none")
    chain.set_frequency_offset(cap.NFM_OFFSET)
    chain.set_squelch_level(-150.0)
    ours = run_chain(chain, iq).astype(np.float64) / 32768.0
    ref48 = oracle.nfm_chain(np.asarray(iq, np.complex128), FS, 48000.0,
                             cap.NFM_OFFSET, tau=NFM_TAU)
    ref12 = oracle.fir_decimate(ref48, 4,
                                oracle.lowpass_taps(0.125, 0.15 / 4))
    ref = oracle.agc(ref12)
    _, r, t = oracle.align(settled(ref, 12000), settled(ours, 12000),
                           max_lag=256)
    g = float(np.dot(r, t) / max(np.dot(t, t), 1e-12))
    snr = oracle.snr_db(r, t * g)
    assert snr >= 12.0, f"AGC-inclusive parity {snr:.1f} dB < 12 dB"
