"""Format conversion and misc elementwise ops at the stream edges.

Reference analog: ``pycsdr.modules.Convert`` / ``Gain`` / ``Downmix`` /
``Throttle`` (reference ``csdr/chain/clientaudio.py:12``,
``csdr/chain/hdradio.py:19-21``).  Device math is always float32/complex64;
SHORT/COMPLEX_SHORT exist only at host boundaries.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SHORT_SCALE = 32767.0


def float_to_short(x: jnp.ndarray) -> jnp.ndarray:
    """float [−1,1] → int16 (client audio egress)."""
    return jnp.clip(x * SHORT_SCALE, -32768, 32767).astype(jnp.int16)


def short_to_float(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32) * (1.0 / SHORT_SCALE)


def complex_short_to_complex(iq: np.ndarray) -> np.ndarray:
    """Host ingest: interleaved int16 IQ → complex64 (numpy, zero-copy-ish)."""
    f = iq.astype(np.float32) * (1.0 / SHORT_SCALE)
    return (f[..., 0::2] + 1j * f[..., 1::2]).astype(np.complex64)


def uint8_iq_to_complex(raw: np.ndarray) -> np.ndarray:
    """RTL-SDR style unsigned 8-bit IQ → complex64 in [−1, 1]."""
    f = (raw.astype(np.float32) - 127.4) * (1.0 / 128.0)
    return (f[..., 0::2] + 1j * f[..., 1::2]).astype(np.complex64)


def downmix(x: jnp.ndarray) -> jnp.ndarray:
    """Stereo (..., N, 2) → mono (..., N)."""
    return x.mean(axis=-1)
