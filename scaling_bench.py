"""Multi-host weak-scaling measurement → SCALING.json (BASELINE config #5).

Real pods are not reachable from this environment (one tunnel-attached
chip), so the ≥85 % scaling-efficiency target is measured on its two
honest analogs:

1. **virtual mesh (ICI analog)** — headline: 1 vs 2 in-process CPU
   devices on the 2-core host, collectives are XLA memcpys, one device
   per physical core.  This models chips coupled by ICI (where the
   all_to_all transpose runs at hundreds of GB/s next to µs-scale
   compute) and is the "efficiency number on the virtual mesh" the
   round-1 verdict asked for.
2. **2-process cluster (DCN analog)** — the full production multi-host
   path: jax.distributed join, per-host slab ingest via
   make_array_from_process_local_data, gloo collectives for the
   ppermute halo + all_to_all re-shard.  Loopback-TCP gloo on a 2-core
   box bandwidth-bounds the transpose (~100 MB/s vs real DCN NICs), so
   this leg UNDERSTATES pod hardware; it is reported for completeness
   and to prove the mechanism end-to-end.

Weak scaling: each host/device runs CH_PER_HOST channels of its slab;
doubling hosts doubles channels and total samples.
efficiency(n) = samples_per_s(n) / (n * samples_per_s(1))
"""

import json
import os
import socket
import subprocess
import sys
import time

CH_PER_HOST = 16
BLOCKS = 24


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    return env


def run_cluster(num_processes: int, channels: int):
    port = _free_port()
    ncores = os.cpu_count() or 1
    procs = [
        subprocess.Popen(
            # pin each host-process to its own core: XLA's intra-op pool
            # otherwise lets the 1-host leg use every core, which would
            # understate scaling (weak scaling = fixed resources per host)
            ["taskset", "-c", str(p % ncores),
             sys.executable, "-m", "openwebrx_tpu.parallel.cluster",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(num_processes), "--process-id", str(p),
             "--channels", str(channels), "--bench-blocks", str(BLOCKS)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True)
        for p in range(num_processes)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}")
        outs.append(json.loads(
            [ln for ln in out.splitlines() if ln.startswith("{")][-1]))
    # all hosts step the same global program; report the slowest view
    return min(o["samples_per_s"] for o in outs)


def run_virtual_mesh():
    """In-process weak scaling on the virtual CPU mesh (ICI analog):
    the worker script measures 1 device (CH channels) vs 2 devices
    (2·CH channels) inside ONE process, pinned to the 2 physical cores."""
    code = f"""
import os, time
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np, jax, json
from openwebrx_tpu.parallel.cluster import ClusterInfo, DistributedReceiver
from openwebrx_tpu.runtime.channelized import ChannelizedBank

def leg(ndev, ch, blocks={BLOCKS}, seconds=0.4):
    devs = jax.devices()[:ndev]
    bank = ChannelizedBank(48000.0*ch, ch, mode="usb", compression="none",
                           target_seconds=seconds)
    for k in range(ch):
        bank.assign(float((k-ch//2)*48000.0*0.9))
    rx = DistributedReceiver(bank, ClusterInfo(0,1,ndev,ndev), devices=devs)
    rng = np.random.default_rng(0)
    xs = [(rng.standard_normal(bank.block)+1j*rng.standard_normal(bank.block)
          ).astype(np.complex64)*0.1 for _ in range(3)]
    for i in range(2):
        rx.process_local(xs[i%3])
    t0 = time.perf_counter()
    for i in range(blocks):
        rx.process_local(xs[i%3])
    return bank.block*blocks/(time.perf_counter()-t0)

s1 = leg(1, {CH_PER_HOST}); s2 = leg(2, {2 * CH_PER_HOST})
print(json.dumps({{"s1": s1, "s2": s2}}))
"""
    out = subprocess.run([sys.executable, "-c", code], env=_worker_env(),
                         capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    res = json.loads([ln for ln in out.stdout.splitlines()
                      if ln.startswith("{")][-1])
    return res["s1"], res["s2"]


def main():
    s1v, s2v = run_virtual_mesh()
    eff_virtual = s2v / (2 * s1v)
    print(f"virtual mesh: 1 dev {s1v / 1e6:.3f} MS/s, "
          f"2 dev {s2v / 1e6:.3f} MS/s, eff={eff_virtual:.3f}", flush=True)
    results = {}
    for n in (1, 2):
        sps = run_cluster(n, CH_PER_HOST * n)
        results[n] = sps
        print(f"{n} host(s) × 1 device, {CH_PER_HOST * n} ch: "
              f"{sps / 1e6:.3f} MS/s", flush=True)
    eff_cluster = results[2] / (2 * results[1])
    doc = {
        "metric": "weak_scaling_efficiency_virtual_mesh",
        "value": round(eff_virtual, 4),
        "unit": "fraction (2 devices vs 2x 1 device, in-process)",
        "vs_baseline": round(eff_virtual / 0.85, 4),
        "virtual_mesh": {"curve": {"1": s1v, "2": s2v},
                         "efficiency": round(eff_virtual, 4),
                         "collectives": "in-process XLA (ICI analog)"},
        "two_process_cluster": {
            "curve": {str(n): results[n] for n in results},
            "efficiency": round(eff_cluster, 4),
            "collectives": "gloo over loopback TCP (DCN analog; "
                           "bandwidth-bound at ~100 MB/s on this box — "
                           "understates real DCN)"},
        "channels_per_host": CH_PER_HOST,
        "blocks": BLOCKS,
        "method": "weak scaling, fixed per-host channels, 1 CPU device "
                  "per physical core (2 cores total). Target >= 0.85 "
                  "(BASELINE config #5).",
        "ts": time.time(),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
