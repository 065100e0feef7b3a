"""Rig control: mirror the tuned frequency to a physical transceiver.

Reference: ``owrx/rigcontrol.py:14`` — hamlib ``rigctl`` subprocess (Popen
at :395) driven with `F <freq>` commands whenever a client retunes.
"""

from __future__ import annotations

import logging
import subprocess
import threading

logger = logging.getLogger(__name__)


class RigControl:
    _instance = None
    _lock = threading.Lock()

    @classmethod
    def shared(cls):
        with cls._lock:
            if cls._instance is None:
                cls._instance = RigControl()
            return cls._instance

    def __init__(self):
        from openwebrx_tpu.core.config import Config
        config = Config.get()
        self.enabled = bool(config.get("rig_enabled"))
        self.proc: subprocess.Popen | None = None
        if self.enabled:
            self._start(config)

    def _start(self, config):
        model = str(config.get("rig_model", 2))
        device = str(config.get("rig_device", "127.0.0.1:4533"))
        cmd = ["rigctl", "-m", model]
        if ":" in device:  # network rigctld
            cmd = ["rigctl", "-m", "2", "-r", device]
        else:
            cmd += ["-r", device]
        cmd.append("-")  # read commands from stdin
        try:
            self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                         stdout=subprocess.DEVNULL,
                                         stderr=subprocess.DEVNULL)
        except FileNotFoundError:
            logger.warning("rigctl not available; rig control disabled")
            self.enabled = False

    def set_frequency(self, freq_hz: float):
        if not self.enabled or self.proc is None or self.proc.poll() is not None:
            return
        try:
            self.proc.stdin.write(f"F {int(freq_hz)}\n".encode())
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            logger.warning("rigctl pipe broken")
            self.enabled = False

    def stop(self):
        if self.proc is not None:
            try:
                self.proc.stdin.close()
            except OSError:
                pass
            self.proc.terminate()
