"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md §4 implication), and DSP
golden tests are platform-independent.  The axon TPU platform plugin
ignores JAX_PLATFORMS, so we pin the default device to CPU explicitly.
MUST run before any test imports jax-using modules.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

CPU_DEVICES = jax.devices("cpu")
