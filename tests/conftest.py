"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §4 implication), and DSP
golden tests are platform-independent.

The environment pins JAX_PLATFORMS=axon (a remote-compile TPU tunnel that
serializes across processes — letting tests touch it causes cross-process
compile stalls), so we FORCE cpu here.  MUST run before jax is imported.
"""

import os

# IMPORTANT: do NOT set JAX_PLATFORMS=cpu here.  This host has 2 cores and
# compiles through the axon plugin's remote-compile service; disabling the
# plugin forces ~70x slower local XLA compiles (14 s per conv).  Instead we
# keep the plugin registered and pin the default DEVICE to CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

CPU_DEVICES = jax.devices("cpu")
