"""SSTV decoder (Martin/Scottie families), host side.

Reference: ``SstvDemodulator`` + native ``SstvDecoder`` + ``owrx/sstv.py``
(binary line protocol → BMP → storage).  The device chain (models/fax.py
FaxChain with SSTV subcarrier parameters) delivers the instantaneous
frequency of the 1100–2300 Hz subcarrier; this module detects the 1200 Hz
line syncs, slices each line into its G/B/R scans and assembles RGB rows.

Frequencies: sync 1200 Hz, black 1500 Hz, white 2300 Hz.
"""

from __future__ import annotations

import numpy as np

from openwebrx_tpu.models.secondary import IF_RATE

SSTV_CARRIER = 1700.0   # chain shifts this to 0
SSTV_DEV = 600.0        # ±600 ⇒ 1100..2300 Hz

MODES = {
    # name: (line_ms, sync_ms, scan order, scan_ms each, width)
    "martin_m1": {"sync_ms": 4.862, "separator_ms": 0.572,
                  "scan_ms": 146.432, "order": "GBR", "width": 320},
    "martin_m2": {"sync_ms": 4.862, "separator_ms": 0.572,
                  "scan_ms": 73.216, "order": "GBR", "width": 320},
    "scottie_s1": {"sync_ms": 9.0, "separator_ms": 1.5,
                   "scan_ms": 138.24, "order": "GBR", "width": 320},
}


class SstvDecoder:
    """Feed normalized-frequency samples (from the SSTV chain at
    sample_rate); emits RGB rows via on_row(np.uint8 (width, 3))."""

    def __init__(self, mode: str = "martin_m1", sample_rate: float = 3000.0,
                 on_row=None):
        spec = MODES[mode]
        self.rate = sample_rate
        self.on_row = on_row
        self.width = spec["width"]
        self.sync_len = int(spec["sync_ms"] / 1000 * sample_rate)
        self.sep_len = int(spec["separator_ms"] / 1000 * sample_rate)
        self.scan_len = spec["scan_ms"] / 1000 * sample_rate
        self.order = spec["order"]
        self.line_len = int(round(self.sync_len + 3 * self.sep_len +
                                  3 * self.scan_len))
        self._buf = np.empty(0, np.float32)
        self.rows: list[np.ndarray] = []

    # frequency helpers: chain output is (f − carrier)/(IF_RATE/2)
    def _to_hz(self, x: np.ndarray) -> np.ndarray:
        return SSTV_CARRIER + x * (IF_RATE / 2)

    def feed(self, samples: np.ndarray):
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = samples.real
        self._buf = np.concatenate([self._buf, samples.astype(np.float32)])
        self._consume()

    def _find_sync(self, hz: np.ndarray) -> int | None:
        """Locate the end of a 1200 Hz sync pulse near the buffer start."""
        is_sync = hz < 1350.0
        # moving sum over the sync length
        kernel = np.ones(self.sync_len)
        score = np.convolve(is_sync.astype(np.float32), kernel, mode="valid")
        hits = np.flatnonzero(score > 0.8 * self.sync_len)
        if len(hits) == 0:
            return None
        return int(hits[0]) + self.sync_len

    def _consume(self):
        while True:
            if len(self._buf) < self.line_len + 2 * self.sync_len:
                return
            hz = self._to_hz(self._buf)
            start = self._find_sync(hz[: self.line_len + self.sync_len])
            if start is None:
                # no sync in a whole line: drop most of it and rescan
                self._buf = self._buf[self.line_len // 2:]
                continue
            if len(self._buf) < start + self.line_len:
                return
            line_hz = hz[start: start + self.line_len]
            self._decode_line(line_hz)
            self._buf = self._buf[start + self.line_len - self.sync_len:]

    def _decode_line(self, line_hz: np.ndarray):
        pos = 0.0
        channels = {}
        for ch in self.order:
            pos += self.sep_len
            seg = line_hz[int(pos): int(pos + self.scan_len)]
            pos += self.scan_len
            # resample scan to width pixels
            idx = np.minimum((np.arange(self.width) * len(seg) / self.width
                              ).astype(int), len(seg) - 1)
            bright = np.clip((seg[idx] - 1500.0) / 800.0 * 255.0, 0, 255)
            channels[ch] = bright.astype(np.uint8)
        row = np.stack([channels.get("R", channels["G"]),
                        channels["G"],
                        channels.get("B", channels["G"])], axis=-1)
        self.rows.append(row)
        if self.on_row is not None:
            self.on_row(row)

    def image(self) -> np.ndarray | None:
        return np.stack(self.rows) if self.rows else None
