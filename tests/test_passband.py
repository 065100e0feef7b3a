"""Passband edge dragging, server side (VERDICT r3 item 5): dspcontrol
{low_cut, high_cut} must apply ASYMMETRIC cuts to the listener's channel
(reference lib/Demodulator.js drag → owrx/dsp.py low_cut/high_cut wires →
Bandpass.setBandpass)."""

import asyncio
import json

import numpy as np
import pytest

from openwebrx_tpu.core.config import Config
from openwebrx_tpu.ops.adpcm import SYNC_INTERVAL, adpcm_decode_np
from tests.test_server import WsTestClient


@pytest.fixture()
def usb_tone_config():
    Config.reset()
    config = Config.get()
    config["sdrs"] = {
        "demo": {
            "name": "PB", "type": "signal",
            "samp_rate": 240000, "center_freq": 14100000,
            "throttle": False, "noise": 2e-4,
            # USB signal: tone lands at 1500 Hz audio
            "signals": [{"kind": "usb", "offset_hz": 14500.0,
                         "f_audio": 1500.0, "amplitude": 0.5}],
            "profiles": {"default": {
                "name": "PB", "center_freq": 14100000, "samp_rate": 240000,
                "start_freq": 14114500, "start_mod": "usb"}},
        }
    }
    yield config
    from openwebrx_tpu.sdr import SdrService
    SdrService.stop_all()
    Config.reset()


def decode_wire(frames: list[bytes]) -> np.ndarray:
    """Decode 0x02 wire bytes (SYNC-framed IMA ADPCM) to int16 PCM."""
    data = b"".join(frames)
    out = []
    pos = 0
    state = (0, 0)
    while pos < len(data):
        if data[pos:pos + 4] == b"SYNC":
            idx, pred = np.frombuffer(data[pos + 4:pos + 8], "<i2")
            state = (int(pred), int(idx))
            pos += 8
        chunk = data[pos:pos + SYNC_INTERVAL]
        pos += len(chunk)
        pcm, state = adpcm_decode_np(chunk, state)
        out.append(pcm)
    return np.concatenate(out) if out else np.zeros(0, np.int16)


def tone_power_ratio(pcm: np.ndarray, f_tone: float, fs: float = 12000.0):
    """Power in ±60 Hz of f_tone relative to total, in dB."""
    x = pcm.astype(np.float32)
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / fs)
    band = (freqs > f_tone - 60) & (freqs < f_tone + 60)
    total = spec[(freqs > 50)].sum()
    return 10 * np.log10(spec[band].sum() / max(total, 1e-12) + 1e-12)


@pytest.mark.usefixtures("usb_tone_config")
class TestPassbandProtocol:
    def test_asymmetric_cuts_applied(self):
        asyncio.run(self._session())

    async def _session(self):
        from openwebrx_tpu.sdr import SdrService
        from openwebrx_tpu.web.http import HttpServer
        from openwebrx_tpu.web.server import build_router

        SdrService.load()
        server = HttpServer(build_router(), port=0, host="127.0.0.1")
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            client = await WsTestClient.connect(port)
            await client.receive()
            await client.send_text("SERVER DE CLIENT client=t type=receiver")
            await client.expect_json("config")
            await client.send_text(json.dumps(
                {"type": "dspcontrol", "action": "start"}))
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"offset_freq": 14500, "mod": "usb",
                            "squelch_level": -150,
                            "low_cut": 0.0, "high_cut": 3000.0}}))
            # settle, then measure: tone at 1500 Hz inside the passband.
            # The channel's AGC re-normalizes whatever survives the
            # bandpass, so audio spectra can't see the cut on a clean
            # tone — the SQUELCH POWER (s-meter) taps the signal right
            # after the bandpass and shows it directly.
            await client.collect_binary(0x02, 3)
            pcm = decode_wire(await client.collect_binary(0x02, 4))
            assert tone_power_ratio(pcm, 1500.0) > -6.0, "tone missing"

            async def smeter_db(n=3):
                vals = []
                for _ in range(n):
                    msg = await client.expect_json("smeter", timeout=10)
                    vals.append(msg["value"])
                return float(np.median(vals))

            open_db = await smeter_db()

            # drag the high cut below the tone: [0, 900] removes ~all of
            # the channel power (the tone was the only signal)
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"low_cut": 0.0, "high_cut": 900.0}}))
            await client.collect_binary(0x02, 2)   # transient flush
            cut_db = await smeter_db()
            assert cut_db < open_db - 25.0, \
                f"high_cut not applied: {open_db:.1f} → {cut_db:.1f} dB"

            # asymmetric window that still contains the tone: [1200, 3000]
            await client.send_text(json.dumps(
                {"type": "dspcontrol",
                 "params": {"low_cut": 1200.0, "high_cut": 3000.0}}))
            await client.collect_binary(0x02, 2)
            back_db = await smeter_db()
            assert back_db > cut_db + 20.0, \
                f"tone did not come back: {cut_db:.1f} → {back_db:.1f} dB"
            assert abs(back_db - open_db) < 6.0
            await client.close()
        finally:
            await server.stop()
            SdrService.stop_all()
