"""WEFAX end-to-end: synthesized fax transmission → decoded image rows."""

import numpy as np

from openwebrx_tpu.models.fax import FaxChain, CARRIER_HZ, DEVIATION_HZ, PIXEL_RATE
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Program
from openwebrx_tpu.services.fax import FaxDecoder

FS = 48000.0
LPM = 120.0


def synthesize_fax(pattern_rows: np.ndarray, offset_hz: float) -> np.ndarray:
    """Rows of brightness (0..255) → USB IQ at FS with the fax subcarrier."""
    spl_audio = int(FS * 60.0 / LPM)
    lines = []
    for row in pattern_rows:
        # brightness → frequency: black 1500, white 2300
        px = np.repeat(row, spl_audio // len(row) + 1)[:spl_audio]
        freq = CARRIER_HZ + (px / 255.0 * 2 - 1) * DEVIATION_HZ
        lines.append(freq)
    freq = np.concatenate(lines)
    phase = 2 * np.pi * np.cumsum(freq + offset_hz) / FS
    return (0.5 * np.exp(1j * phase)).astype(np.complex64)


class TestFax:
    def test_decode_pattern(self):
        # phasing lines: white with a black pulse at the start
        spl = int(PIXEL_RATE * 60.0 / LPM)
        width = 200
        phasing = np.full((6, width), 255, np.uint8)
        phasing[:, : max(1, int(0.025 * width))] = 0
        # image: alternating black/white half-lines
        img = np.zeros((10, width), np.uint8)
        img[:, width // 2:] = 255
        pattern = np.concatenate([phasing, img])

        offset = 5000.0
        x = synthesize_fax(pattern, offset)
        chain = FaxChain(FS)
        chain.set_frequency_offset(offset)
        spec = StreamSpec(Format.COMPLEX_FLOAT, FS)
        block = plan_block_size(chain, spec, 0.1)
        prog = Program(chain, spec, block)

        rows = []
        decoder = FaxDecoder(LPM, on_row=rows.append)
        n = len(x) // block
        for blk in np.split(x[: n * block], n):
            y, _ = prog.process(blk)
            decoder.feed(np.asarray(y))
        assert len(rows) >= 8, f"only {len(rows)} rows decoded"
        # find a decoded row from the image part: left half black, right white
        img_rows = [r for r in rows
                    if r[: spl // 4].mean() < 80 and r[-spl // 4:].mean() > 180]
        assert img_rows, "no image rows with the expected pattern"
