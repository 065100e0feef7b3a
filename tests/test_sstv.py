"""SSTV Martin M1 end-to-end: synthesized transmission → decoded RGB rows."""

import numpy as np

from openwebrx_tpu.models.fax import FaxChain
from openwebrx_tpu.models import fax as fax_model
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Program
from openwebrx_tpu.services.sstv import SstvDecoder, MODES, SSTV_CARRIER, SSTV_DEV

FS = 48000.0
RATE = 3000.0  # chain output rate


def synthesize_martin(rows_rgb: np.ndarray, offset_hz: float) -> np.ndarray:
    spec = MODES["martin_m1"]
    def tone(freq_hz, ms):
        return np.full(int(FS * ms / 1000), freq_hz)
    freq = []
    for row in rows_rgb:
        freq.append(tone(1200.0, spec["sync_ms"]))
        for ch in spec["order"]:
            freq.append(tone(1500.0, spec["separator_ms"]))
            comp = row[:, {"G": 1, "B": 2, "R": 0}[ch]]
            px = np.repeat(comp, int(FS * spec["scan_ms"] / 1000) // len(comp) + 1)
            px = px[: int(FS * spec["scan_ms"] / 1000)]
            freq.append(1500.0 + px / 255.0 * 800.0)
    freq = np.concatenate(freq)
    phase = 2 * np.pi * np.cumsum(freq + offset_hz) / FS
    return (0.5 * np.exp(1j * phase)).astype(np.complex64)


class TestSstv:
    def test_martin_m1_rows(self):
        width = 320
        # pattern: pure green top rows, then red/blue split rows
        rows = np.zeros((6, width, 3), np.uint8)
        rows[:3, :, 1] = 230                  # green rows
        rows[3:, : width // 2, 0] = 230       # red left
        rows[3:, width // 2:, 2] = 230        # blue right

        offset = -20000.0
        x = synthesize_martin(rows, offset)
        chain = FaxChain(FS, carrier_hz=SSTV_CARRIER, deviation_hz=SSTV_DEV)
        chain.set_frequency_offset(offset)
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        block = plan_block_size(chain, spec, 0.1)
        prog = Program(chain, spec, block)
        decoded = []
        decoder = SstvDecoder("martin_m1", RATE, on_row=decoded.append)
        n = len(x) // block
        for blk in np.split(x[: n * block], n):
            y, _ = prog.process(blk)
            decoder.feed(np.asarray(y))
        assert len(decoded) >= 4, f"only {len(decoded)} SSTV rows decoded"
        green_rows = [r for r in decoded if r[:, 1].mean() > 150
                      and r[:, 0].mean() < 100]
        split_rows = [r for r in decoded
                      if r[: width // 4, 0].mean() > 120
                      and r[-width // 4:, 2].mean() > 120]
        assert green_rows, "no green rows recovered"
        assert split_rows, "no red/blue split rows recovered"
