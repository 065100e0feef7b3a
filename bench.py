"""Benchmark: multi-channel NFM receiver bank throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The flagship configuration measures BASELINE configs #1/#3 combined: a
2.4 MS/s IQ stream demodulated by a 64-channel NFM ChannelBank (full path:
NCO shift → FIR decimate ×50 → FFT bandpass → squelch → FM demod →
deemphasis → AGC → resample to 12 kHz → ADPCM), end to end including
host→device block transfer.  value = sustained IQ Msamples/s;
vs_baseline = value / 2.4 (the reference csdr chain is real-time at
2.4 MS/s per channel chain on CPU — no published numbers exist, see
BASELINE.md, so real-time rate is the parity bar).
"""

import json
import time

import numpy as np

CHANNELS = 64
FS = 2.4e6
WARMUP = 2
BLOCKS = 20


def main():
    import jax
    from openwebrx_tpu.runtime.bank import ChannelBank

    bank = ChannelBank(FS, mode="nfm", capacity=CHANNELS, compression="adpcm",
                       target_seconds=0.1)
    rng = np.random.default_rng(0)
    for i in range(CHANNELS):
        bank.add_channel(float(rng.uniform(-FS / 2 * 0.8, FS / 2 * 0.8)),
                         squelch_db=-150.0)

    # a few distinct IQ blocks so transfers are not elided
    blocks = [
        (rng.standard_normal(bank.block) + 1j * rng.standard_normal(bank.block)
         ).astype(np.complex64) * 0.2
        for _ in range(4)
    ]

    for i in range(WARMUP):
        y, aux = bank.process(blocks[i % len(blocks)])
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for i in range(BLOCKS):
        y, aux = bank.process(blocks[i % len(blocks)])
    jax.block_until_ready(y)
    elapsed = time.perf_counter() - t0

    iq_samples = BLOCKS * bank.block
    msps = iq_samples / elapsed / 1e6
    print(json.dumps({
        "metric": f"IQ throughput, {CHANNELS}-channel NFM bank (full chain incl. ADPCM)",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 2.4, 2),
    }))


if __name__ == "__main__":
    main()
