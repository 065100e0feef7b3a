"""DSC decoding + source retry-budget tests."""

import time

import numpy as np

from openwebrx_tpu.digimodes.dsc import (
    DscDecoder, encode_call, encode_symbol, decode_symbol,
    FMT_SELECTIVE, EOS_REQ,
)
from openwebrx_tpu.core.property import PropertyLayer
from openwebrx_tpu.sources.base import SdrSource, SdrSourceState


class TestDsc:
    def test_symbol_check(self):
        for v in (0, 1, 100, 127):
            bits = encode_symbol(v)
            assert decode_symbol(bits) == v
        bad = encode_symbol(100)
        bad[0] ^= 1
        assert decode_symbol(bad) is None

    def test_selective_call(self):
        bits = np.array(encode_call(FMT_SELECTIVE, "2113456780", 108,
                                    [26, 0], eos=EOS_REQ))
        messages = []
        dec = DscDecoder(messages.append)
        dec.feed_bits(bits)
        assert messages, "no DSC message"
        msg = messages[0]
        assert msg["format"] == "selective"
        assert msg["address"] == "2113456780"
        assert msg["category"] == "safety"
        assert msg["eos"] == "ack required"


class FlakySource(SdrSource):
    RETRY_DELAY = 0.1

    def __init__(self, *args, fail_times=2, **kwargs):
        super().__init__(*args, **kwargs)
        self.fail_times = fail_times
        self.attempts = 0

    def _run_stream(self):
        self.attempts += 1
        if self.attempts <= self.fail_times:
            raise ConnectionError("boom")
        while not self._stop_requested:
            self._deliver(np.zeros(100, np.complex64))
            time.sleep(0.01)


class TestRetryBudget:
    def test_recovers_after_transient_failures(self):
        src = FlakySource("flaky", PropertyLayer(samp_rate=48000,
                                                 **{"always-on": True}),
                          fail_times=2)
        src.block_size = 100
        src.start()
        deadline = time.time() + 5
        # RUNNING is set briefly even on a failing attempt, so wait for the
        # attempt counter too, not just the state
        while (src.attempts < 3 or
               src.get_state() is not SdrSourceState.RUNNING) and \
                time.time() < deadline:
            time.sleep(0.05)
        assert src.attempts == 3
        assert not src.is_failed()
        assert src.read_block(timeout=2) is not None
        src.shutdown()

    def test_fails_after_budget_exhausted(self):
        src = FlakySource("dead", PropertyLayer(samp_rate=48000,
                                                **{"always-on": True}),
                          fail_times=99)
        src.MAX_RETRIES = 2
        src.block_size = 100
        src.start()
        deadline = time.time() + 5
        while not src.is_failed() and time.time() < deadline:
            time.sleep(0.05)
        assert src.is_failed()
        assert src.attempts == 3  # initial + 2 retries
        src.shutdown()


class TestDscDistress:
    def test_distress_call_with_position(self):
        """ITU-R M.493 distress call: self-id MMSI, nature, quadrant-coded
        coordinates and UTC time decode into map-ready fields."""
        from openwebrx_tpu.digimodes.dsc import FMT_DISTRESS, EOS_NONE

        # MMSI 211345678, nature flooding (101), 52°30'N 013°24'E, 16:45
        body = [13, 45, 67, 80,            # rest of the MMSI digits
                101,                        # nature of distress
                5, 23, 0, 13, 24,           # quadrant 0, 5230, 01324
                16, 45,                     # time UTC
                100]                        # subsequent comms
        bits = np.array(encode_call(FMT_DISTRESS, "", 21, body,
                                    eos=EOS_NONE))
        messages = []
        DscDecoder(messages.append).feed_bits(bits)
        assert messages, "no DSC distress decoded"
        msg = messages[0]
        assert msg["format"] == "distress"
        assert msg["mmsi"] == "211345678"
        assert msg["nature"] == "flooding"
        assert abs(msg["lat"] - 52.5) < 1e-3
        assert abs(msg["lon"] - 13.4) < 1e-3
        assert msg["time_utc"] == "1645"
        assert msg["category"] == "distress"

    def test_distress_unknown_position(self):
        from openwebrx_tpu.digimodes.dsc import FMT_DISTRESS, EOS_NONE

        body = [13, 45, 67, 80, 107,
                99, 99, 99, 99, 99,         # position unknown (all 9s)
                88, 88, 100]
        bits = np.array(encode_call(FMT_DISTRESS, "", 21, body,
                                    eos=EOS_NONE))
        messages = []
        DscDecoder(messages.append).feed_bits(bits)
        assert messages and "lat" not in messages[0]
        assert messages[0]["nature"] == "undesignated"
