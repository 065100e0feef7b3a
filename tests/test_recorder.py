"""Audio recorder service + log history tests."""

import logging
import time

import numpy as np

from openwebrx_tpu.core.loghistory import HistoryHandler
from openwebrx_tpu.core.storage import Storage
from openwebrx_tpu.services.recorder import AudioRecorder


class TestRecorder:
    def test_squelch_gated_recording(self, tmp_path, monkeypatch):
        import shutil
        monkeypatch.setattr(shutil, "which", lambda name: None)  # WAV fallback
        storage = Storage(str(tmp_path))
        rec = AudioRecorder("test", squelch_level=0.01, hang_time=0.05,
                            storage=storage)
        silence = np.zeros(1200, np.int16).tobytes()
        loud = (np.sin(np.arange(1200)) * 20000).astype(np.int16).tobytes()
        rec.feed(silence)
        assert storage.list_files() == []  # no file for silence
        rec.feed(loud)
        rec.feed(loud)
        time.sleep(0.1)
        rec.feed(silence)  # past hang time → stops
        rec.close()
        files = storage.list_files()
        assert len(files) == 1 and files[0].endswith(".wav")
        import os
        assert os.path.getsize(str(tmp_path / files[0])) > 2000


class TestLogHistory:
    def test_ring(self):
        handler = HistoryHandler.get_handler("test.ring")
        log = logging.getLogger("test.ring")
        log.warning("first")
        for i in range(250):
            log.warning("msg %d", i)
        lines = handler.get_lines()
        assert len(lines) == 200
        assert "msg 249" in lines[-1]
        assert all("first" not in line for line in lines)
