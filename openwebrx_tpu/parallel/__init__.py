"""Multi-chip scaling: mesh construction, channel sharding, halo exchange.

The reference's transport fabric is threads + ring buffers + TCP on one
host (SURVEY §2.6).  The TPU-native replacement (BASELINE north star):

- **channel sharding** — the ChannelBank's leading channel axis is sharded
  over the mesh; each chip demodulates its slice of listeners from the same
  (replicated or slab-sharded) IQ block.  XLA inserts any needed gathers.
- **time-block sharding + halo exchange** — wideband IQ is split along time
  across chips; streaming FIR state becomes a ppermute ring of boundary
  samples (the convolutional analog of ring-attention neighbor passing,
  SURVEY §5.7).
- **frequency-slab sharding** — the polyphase channelizer's output channel
  axis is sharded, so each chip owns a frequency slab of narrowband
  channels.
"""

from openwebrx_tpu.parallel.mesh import make_mesh, cpu_devices

__all__ = ["make_mesh", "cpu_devices"]
