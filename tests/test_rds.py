"""Native RDS: logical layer, physical layer, and the on-device WFM tap."""

import numpy as np
import pytest

from openwebrx_tpu.digimodes.rds import (
    OFFSETS, RdsDecoder, _GroupAssembler, make_group, rds_bitstream,
    rds_checkword, rds_modulate,
)

PI = 0x52A1


def ps_groups(ps="TPU FM  ", pty=10):
    groups = []
    for seg in range(4):
        b = (0 << 12) | (1 << 10) | (pty << 5) | seg
        d = (ord(ps[2 * seg]) << 8) | ord(ps[2 * seg + 1])
        groups.append((PI, b, 0x0000, d))
    return groups


def rt_groups(rt="HELLO RADIOTEXT\r"):
    groups = []
    for seg in range(len(rt) // 4):
        b = (2 << 12) | (10 << 5) | seg
        c = (ord(rt[4 * seg]) << 8) | ord(rt[4 * seg + 1])
        d = (ord(rt[4 * seg + 2]) << 8) | ord(rt[4 * seg + 3])
        groups.append((PI, b, c, d))
    return groups


class TestLogical:
    def test_checkword_offsets_distinct(self):
        # every offset yields a distinguishable syndrome on a clean block
        syndromes = {name: rds_checkword(0x1234) ^ (rds_checkword(0x1234)
                     ^ off) for name, off in OFFSETS.items()}
        assert len(set(syndromes.values())) == len(OFFSETS)

    def test_ps_and_radiotext(self):
        events = []
        ga = _GroupAssembler(events.append)
        ga.feed(rds_bitstream(ps_groups() + rt_groups()))
        assert any(e.get("ps") == "TPU FM" for e in events)
        assert any(e.get("radiotext") == "HELLO RADIOTEXT" for e in events)
        assert any(e.get("prog_type") == "Pop music" for e in events)
        assert all(e["pi"] == "0x52A1" for e in events)

    def test_partial_ps_before_complete(self):
        events = []
        ga = _GroupAssembler(events.append)
        ga.feed(rds_bitstream(ps_groups()[:2]))
        partials = [e for e in events if "partial_ps" in e]
        assert partials and partials[-1]["partial_ps"].startswith("TPU ")

    def test_clock_time_group(self):
        # 2026-08-18 12:34 UTC → MJD 61270
        mjd, hour, minute = 61270, 12, 34
        b = (4 << 12) | (10 << 5) | ((mjd >> 15) & 0x3)
        c = ((mjd & 0x7FFF) << 1) | (hour >> 4)
        d = ((hour & 0xF) << 12) | (minute << 6)
        events = []
        ga = _GroupAssembler(events.append)
        ga.feed(rds_bitstream([(PI, b, c, d)] * 2))
        ct = [e for e in events if "clock_time" in e]
        assert ct and ct[0]["clock_time"] == "2026-08-18T12:34"

    def test_resync_after_garbage(self):
        rng = np.random.default_rng(0)
        events = []
        ga = _GroupAssembler(events.append)
        ga.feed(rng.integers(0, 2, 500))
        ga.feed(rds_bitstream(ps_groups() * 2))
        assert any(e.get("ps") == "TPU FM" for e in events)


class TestPhysical:
    def decode(self, wave, rate, decim=16):
        t = np.arange(len(wave))
        bb = wave * np.exp(-2j * np.pi * 57000 * t / rate)
        h = np.blackman(401) * np.sinc(np.linspace(-200, 200, 401)
                                       * 2 * 3000 / rate)
        h /= h.sum()
        lp = np.convolve(bb, h, mode="same")[::decim]
        events = []
        dec = RdsDecoder(rate / decim, events.append)
        for k in range(0, len(lp), 1953):
            dec.process(lp[k: k + 1953])
        return events

    def test_waveform_roundtrip_with_noise_and_phase(self):
        rate = 250000
        wave = rds_modulate((ps_groups() + rt_groups()) * 3, rate,
                            level=0.3, theta=1.1)
        rng = np.random.default_rng(7)
        wave = wave + 0.05 * rng.standard_normal(len(wave))
        events = self.decode(wave, rate)
        assert any(e.get("ps") == "TPU FM" for e in events)
        assert any(e.get("radiotext") == "HELLO RADIOTEXT" for e in events)


class TestDeviceTap:
    def test_wfm_chain_emits_rds_aux_and_decodes(self):
        from openwebrx_tpu.models.receiver import (
            ClientDemodulatorChain, build_program,
        )
        fs = 2.4e6
        if_rate = 250000
        # composite synthesized directly at fs: mono tone + RDS subcarrier,
        # FM-modulated at 75 kHz deviation
        rds_wave = rds_modulate(ps_groups() * 4, fs, level=0.25, theta=0.3)
        t = np.arange(len(rds_wave)) / fs
        composite = 0.5 * np.sin(2 * np.pi * 1000 * t) + rds_wave
        phase = 2 * np.pi * np.cumsum(75000 * composite) / fs
        iq = (0.5 * np.exp(1j * phase)).astype(np.complex64)

        chain = ClientDemodulatorChain(fs, mode="wfm", compression="none")
        chain.set_frequency_offset(0.0)
        prog = build_program(chain, fs, target_seconds=0.1)
        events = []
        from openwebrx_tpu.digimodes.rds import RdsDecoder as Dec
        dec = Dec(if_rate / 16, events.append)
        pad = (-len(iq)) % prog.block
        iq = np.concatenate([iq, np.zeros(pad, np.complex64)])
        for k in range(0, len(iq), prog.block):
            _, aux = prog.process(iq[k: k + prog.block])
            rds_key = [key for key in aux if key.endswith(".rds")]
            assert rds_key, list(aux)
            dec.process(np.asarray(aux[rds_key[0]]))
        assert any(e.get("ps") == "TPU FM" for e in events), events[-3:]
