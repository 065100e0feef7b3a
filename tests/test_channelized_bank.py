"""ChannelizedBank end-to-end: PFB front + batched demod chains."""

import numpy as np

from openwebrx_tpu.runtime.channelized import ChannelizedBank


def tone_snr(audio, f_tone, fs_audio):
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio)))) ** 2
    freqs = np.fft.rfftfreq(len(audio), 1 / fs_audio)
    band = (freqs > f_tone * 0.9) & (freqs < f_tone * 1.1)
    rest = (freqs > 50) & ~band
    return 10 * np.log10(spec[band].sum() / spec[rest].sum())


class TestChannelizedBank:
    def test_two_usb_channels(self):
        fs, m = 1.92e6, 16  # channel rate 120 kHz
        bank = ChannelizedBank(fs, m, mode="usb", compression="none",
                               target_seconds=0.05)
        # two USB signals at arbitrary offsets (tone = offset + f_audio)
        offs = [250000.0, -430000.0]
        f_audio = [1100.0, 700.0]
        slots = [bank.assign(o) for o in offs]
        assert len(set(slots)) == 2

        n = np.arange(bank.block * 6)
        x = sum(0.4 * np.exp(2j * np.pi * (o + fa) / fs * n)
                for o, fa in zip(offs, f_audio)).astype(np.complex64)
        outs = []
        for blk in np.split(x, 6):
            y, aux = bank.process(blk)
            outs.append(np.asarray(y))
        audio = np.concatenate(outs, axis=-1).astype(np.float32) / 32767
        settled = audio[:, audio.shape[1] // 2:]
        for slot, fa in zip(slots, f_audio):
            snr = tone_snr(settled[slot], fa, 12000.0)
            assert snr > 15, f"channel {slot} tone SNR {snr:.1f} dB"

    def test_channel_mapping(self):
        bank = ChannelizedBank(1.92e6, 16, mode="usb", compression="none",
                               target_seconds=0.05)
        k, fine = bank.channel_for(250000.0)
        # channel spacing 120 kHz: 250 kHz → channel 2 (240 kHz) + 10 kHz
        assert k == 2 and abs(fine - 10000.0) < 1e-6
        k, fine = bank.channel_for(-430000.0)
        assert abs(fine) <= 60000.0
