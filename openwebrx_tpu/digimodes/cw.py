"""CW (Morse) decoder (host side).

Reference analog: CwDecoder (reference ``csdr/chain/digimodes.py:133``).
Device side delivers the keying envelope (magnitude at a modest rate);
this module thresholds adaptively, measures mark/space runs, classifies
dit/dah against a tracked dit length, and maps Morse to text.
"""

from __future__ import annotations

import numpy as np

MORSE = {
    ".-": "A", "-...": "B", "-.-.": "C", "-..": "D", ".": "E", "..-.": "F",
    "--.": "G", "....": "H", "..": "I", ".---": "J", "-.-": "K", ".-..": "L",
    "--": "M", "-.": "N", "---": "O", ".--.": "P", "--.-": "Q", ".-.": "R",
    "...": "S", "-": "T", "..-": "U", "...-": "V", ".--": "W", "-..-": "X",
    "-.--": "Y", "--..": "Z",
    "-----": "0", ".----": "1", "..---": "2", "...--": "3", "....-": "4",
    ".....": "5", "-....": "6", "--...": "7", "---..": "8", "----.": "9",
    ".-.-.-": ".", "--..--": ",", "..--..": "?", "-..-.": "/", "-...-": "=",
    ".--.-.": "@", "-.--.": "(", "-.--.-": ")", ".-.-.": "+", "-....-": "-",
}


class CwDecoder:
    """Streaming Morse decoder over envelope samples."""

    def __init__(self, env_rate: float, wpm_hint: float = 20.0):
        self.env_rate = env_rate
        self.dit = env_rate * 1.2 / wpm_hint  # samples per dit (PARIS timing)
        self.level = 0.0
        self._state = False
        self._run = 0
        self._symbol = ""
        self._text: list[str] = []
        self._idle = 0

    def decode(self, envelope: np.ndarray) -> str:
        out = []
        env = np.asarray(envelope, np.float32)
        # adaptive threshold: track a slow average of peaks
        peak = float(env.max()) if len(env) else 0.0
        self.level = max(0.9 * self.level, peak)
        thresh = self.level * 0.5
        keyed = env > max(thresh, 1e-6)
        for k in keyed:
            if k == self._state:
                self._run += 1
                if not k and self._run > 7 * self.dit and self._symbol:
                    out.append(self._flush(word_break=True))
                continue
            # transition: classify the completed run
            run, self._run, prev = self._run, 1, self._state
            self._state = bool(k)
            if prev:  # mark ended: dit or dah
                if run > 2 * self.dit:
                    self._symbol += "-"
                else:
                    self._symbol += "."
                    self.dit = 0.9 * self.dit + 0.1 * run  # track speed
            else:     # space ended
                if run > 2 * self.dit and self._symbol:
                    out.append(self._flush(word_break=run > 5 * self.dit))
        return "".join(out)

    def _flush(self, word_break: bool = False) -> str:
        ch = MORSE.get(self._symbol, "")
        self._symbol = ""
        return ch + (" " if word_break and ch else "")
