"""Native multi-channel CW skimmer: two concurrent signals in one slab."""

import numpy as np

from openwebrx_tpu.digimodes.cw import MORSE, CwSkimmer


def morse_envelope(text: str, wpm: float, env_rate: float) -> np.ndarray:
    """Keying envelope (0/1) at env_rate for the given text."""
    dit = env_rate * 1.2 / wpm
    rev = {v: k for k, v in MORSE.items()}
    out = [np.zeros(int(4 * dit))]
    for ch in text:
        if ch == " ":
            out.append(np.zeros(int(7 * dit)))
            continue
        for sym in rev[ch]:
            out.append(np.ones(int(dit if sym == "." else 3 * dit)))
            out.append(np.zeros(int(dit)))
        out.append(np.zeros(int(3 * dit)))
    out.append(np.zeros(int(8 * dit)))
    return np.concatenate(out)


def keyed_tone(text: str, freq: float, rate: float, wpm: float = 22.0,
               amp: float = 0.5) -> np.ndarray:
    env = morse_envelope(text, wpm, rate)
    # ~5 ms raised-cosine keying shape (real transmitters avoid clicks)
    k = max(3, int(0.005 * rate))
    env = np.convolve(env, np.hanning(k) / (np.hanning(k).sum() + 1e-12),
                      mode="same")
    t = np.arange(len(env)) / rate
    return (amp * env * np.exp(2j * np.pi * freq * t)).astype(np.complex64)


class TestCwSkimmerHost:
    def run_skimmer(self, iq, rate=24000, fft=256, hop=48):
        from numpy.fft import fft as npfft
        n = (len(iq) - fft) // hop
        frames = np.empty((n, fft), np.float32)
        win = np.hanning(fft)
        for k in range(n):
            seg = iq[k * hop: k * hop + fft] * win
            frames[k] = np.abs(np.fft.fftshift(npfft(seg)))
        sk = CwSkimmer(bin_hz=rate / fft, env_rate=rate / hop)
        texts: dict[int, str] = {}
        for k in range(0, n, 100):
            for freq, text in sk.process(frames[k: k + 100]):
                key = int(round(freq / 100.0))
                texts[key] = texts.get(key, "") + text
        return texts

    def test_two_signals_decoded(self):
        rate = 24000
        a = keyed_tone("CQ TEST", -3000.0, rate)
        b = keyed_tone("HELLO", 4500.0, rate, wpm=18)
        n = max(len(a), len(b))
        iq = np.zeros(n, np.complex64)
        iq[: len(a)] += a
        iq[: len(b)] += b
        rng = np.random.default_rng(0)
        iq += (0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
               ).astype(np.complex64)
        texts = self.run_skimmer(iq)
        joined = {k: v.replace(" ", "") for k, v in texts.items()}
        assert any("CQTEST" in v for k, v in joined.items() if k < 0), texts
        assert any("HELLO" in v for k, v in joined.items() if k > 0), texts


class TestCwSkimmerDevicePath:
    def test_chain_program_and_handle_decoder(self):
        from openwebrx_tpu.models.secondary import CwSkimmerChain
        from openwebrx_tpu.models.stages import plan_block_size
        from openwebrx_tpu.ops.formats import Format, StreamSpec
        from openwebrx_tpu.runtime.chain import Program
        from openwebrx_tpu.digimodes.cw import CwSkimmer

        fs = 240000.0
        chain = CwSkimmerChain(fs)
        chain.set_frequency_offset(0.0)
        spec = StreamSpec(Format.COMPLEX_FLOAT, fs)
        block = plan_block_size(chain, spec, 0.1)
        prog = Program(chain, spec, block)

        sig = keyed_tone("TEST", 2000.0, fs, wpm=25, amp=0.4)
        pad = (-len(sig)) % block
        sig = np.concatenate([sig, np.zeros(pad, np.complex64)])
        skimmer = CwSkimmer(chain.bin_hz, chain.env_rate)
        texts = []
        for k in range(0, len(sig), block):
            frames, aux = prog.process(sig[k: k + block])
            texts.extend(t for _, t in skimmer.process(np.asarray(frames)))
        assert "TEST" in "".join(texts).replace(" ", ""), texts
