"""Noise filter + service scheduler tests."""

from datetime import datetime, timedelta, timezone

import numpy as np

from openwebrx_tpu.ops import noisefilter as nr
from openwebrx_tpu.services.schedule import (
    StaticSchedule, DaylightSchedule, ServiceScheduler, sun_times,
)


class TestNoiseFilter:
    def test_improves_tone_snr(self):
        fs = 12000
        n = np.arange(fs * 2)
        rng = np.random.default_rng(0)
        tone = 0.3 * np.sin(2 * np.pi * 800 / fs * n)
        noise = 0.1 * rng.standard_normal(len(n))
        x = (tone + noise).astype(np.float32)  # 24000 = 8 x 3000, HOP-divisible

        state = nr.nr_init()
        outs = []
        for blk in np.split(x, 8):
            state, y = nr.nr_apply(state, 6.0, blk)
            outs.append(np.asarray(y))
        y = np.concatenate(outs)[len(x) // 2:]  # settled second half

        def snr(sig):
            spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig)))) ** 2
            f = np.fft.rfftfreq(len(sig), 1 / fs)
            band = (f > 700) & (f < 900)
            rest = (f > 50) & ~band
            return 10 * np.log10(spec[band].sum() / spec[rest].sum())

        improvement = snr(y) - snr(x[fs:])
        assert improvement > 5, f"NR improved SNR by only {improvement:.1f} dB"

    def test_streaming_shapes(self):
        state = nr.nr_init()
        x = np.zeros(2500, np.float32)
        state, y = nr.nr_apply(state, 3.0, x)
        assert np.asarray(y).shape == x.shape


class FakeSource:
    def __init__(self):
        self.activated = []

    def activate_profile(self, pid):
        self.activated.append(pid)


class TestSchedules:
    def test_static_schedule(self):
        s = StaticSchedule({"0800-1200": "morning", "1200-0200": "rest"})
        t = datetime(2026, 8, 17, 9, 0)
        assert s.get_current_entry(t).profile_id == "morning"
        t2 = datetime(2026, 8, 17, 23, 0)
        assert s.get_current_entry(t2).profile_id == "rest"
        t3 = datetime(2026, 8, 17, 5, 0)
        assert s.get_current_entry(t3) is None
        assert s.get_next_change(t).hour == 12

    def test_sun_times_plausible(self):
        sr, ss = sun_times(52.5, 13.4, datetime(2026, 6, 21, tzinfo=timezone.utc))
        assert 2 <= sr.hour <= 4      # Berlin midsummer sunrise ~03 UTC
        assert 19 <= ss.hour <= 21
        assert sun_times(89.0, 0.0, datetime(2026, 6, 21, tzinfo=timezone.utc)) is None

    def test_daylight_schedule_entries(self):
        s = DaylightSchedule({"day": "d", "night": "n", "greyline": "g"},
                             52.5, 13.4)
        when = datetime(2026, 6, 21, 12, 0, tzinfo=timezone.utc)
        entry = s.get_current_entry(when)
        assert entry.profile_id == "d"
        dawn = s.get_entries(when)[0]
        assert dawn.profile_id == "g"

    def test_scheduler_activates_and_arms(self):
        src = FakeSource()
        sched = ServiceScheduler(
            src, StaticSchedule({"0000-2359": "always"}),
            clock=lambda: datetime(2026, 8, 17, 10, 0))
        assert src.activated == ["always"]
        sched.stop()
