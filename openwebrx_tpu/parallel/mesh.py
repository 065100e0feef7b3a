"""Device mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def cpu_devices(n: int | None = None):
    """CPU devices for mesh simulation (xla_force_host_platform_device_count);
    the axon TPU platform ignores JAX_PLATFORMS, so ask for cpu explicitly."""
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]


def make_mesh(n_devices: int, axes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a Mesh of n_devices.  axes e.g. {"time": 2, "chan": 4}."""
    if devices is None:
        try:
            devices = cpu_devices()
        except RuntimeError:
            devices = jax.devices()
        if len(devices) < n_devices:
            devices = jax.devices()
    devices = devices[:n_devices]
    if axes is None:
        axes = {"chan": n_devices}
    names = tuple(axes)
    shape = tuple(axes.values())
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh axes {axes} ≠ {n_devices} devices")
    return Mesh(np.array(devices).reshape(shape), names)
