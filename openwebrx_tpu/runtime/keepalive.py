"""Transport keep-warm for tunnel-attached accelerators.

Measured on the axon-tunneled TPU (round 5): the device→host result
stream has a cold-start — the FIRST fetch after a few hundred ms of D2H
idle costs 0.2-3 s (occasionally tens of seconds), while back-to-back
fetches of the same size run at ~50 MB/s (17 ms for 0.9 MB).  Workloads
that fetch sporadically (background service banks delivering 0.3-1.2 s
batches) pay the cold-start on EVERY delivery, which can swamp the
entire compute budget.

The fix is embarrassingly simple: while a device runtime is streaming,
fetch a 4-byte token every ~80 ms from a daemon thread.  That keeps the
transport's D2H stream hot so real result fetches run at the hot-path
rate.  Cost: ~2 tiny RPCs per period (~25/s), immaterial next to the
block traffic.  On directly-attached devices (PCIe TPU hosts, CPU) the
heartbeat is harmless nanoseconds of work; it is skipped entirely on the
CPU backend.

This is a transport workaround, not a compute-path component — the
reference has no analog (its DSP never leaves the host).
"""

from __future__ import annotations

import logging
import threading

logger = logging.getLogger(__name__)


class TransportKeepalive:
    """Singleton daemon: refcounted start/stop around streaming loops.

    The heartbeat is IDLE-GATED: it only fires when no real result fetch
    has happened for ``idle_s`` — workloads that already fetch every
    block (interactive banks) never pay a single extra RPC, while
    sporadic-fetch workloads (service delivery batches) get the channel
    kept warm through their gaps.  Fetch sites report in via
    ``note_fetch()`` (runtime/chain.py, runtime/channelized.py)."""

    _instance: "TransportKeepalive | None" = None
    _lock = threading.Lock()
    _last_fetch = 0.0

    @classmethod
    def shared(cls) -> "TransportKeepalive":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    @classmethod
    def note_fetch(cls):
        """Record that a real device→host fetch just ran (lock-free: a
        monotonic float store)."""
        import time
        cls._last_fetch = time.monotonic()

    def __init__(self, period_s: float = 0.05, idle_s: float = 0.15):
        self.period_s = float(period_s)
        self.idle_s = float(idle_s)
        self._refs = 0
        # per-thread stop event: release() may fire while the old thread
        # is blocked inside a multi-second transport RPC — a SHARED event
        # cleared by the next acquire() would let that thread survive and
        # leak a duplicate heartbeat (round-5 review finding)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def acquire(self):
        """Start the heartbeat (refcounted)."""
        with self._lock:
            self._refs += 1
            if self._thread is not None:
                return
            try:
                import jax
                if jax.default_backend() == "cpu":
                    return                      # directly attached — no-op
            except Exception:
                return
            self._stop = threading.Event()      # fresh event per thread
            self._thread = threading.Thread(target=self._run,
                                            args=(self._stop,),
                                            name="d2h-keepalive", daemon=True)
            self._thread.start()
            # a daemon thread killed mid-RPC at interpreter exit can abort
            # the transport client's C++ layer ("terminate called") — stop
            # it cleanly first
            if not getattr(self, "_atexit_registered", False):
                self._atexit_registered = True
                import atexit
                atexit.register(self._shutdown)

    def _shutdown(self):
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout=1.0)
            self._thread = None

    def release(self):
        with self._lock:
            self._refs = max(0, self._refs - 1)
            if self._refs == 0 and self._thread is not None:
                self._stop.set()
                self._thread = None

    def _run(self, stop: threading.Event):
        try:
            import time
            import jax
            import jax.numpy as jnp
            import numpy as np
            inc = jax.jit(lambda x: x + 1)
            token = jnp.zeros((1,), jnp.int32)
            while not stop.wait(self.period_s):
                if time.monotonic() - type(self)._last_fetch < self.idle_s:
                    continue          # real fetches are keeping it warm
                token = inc(token)
                try:
                    token.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                np.asarray(token)
                type(self)._last_fetch = time.monotonic()
        except Exception:
            logger.exception("transport keepalive stopped")
