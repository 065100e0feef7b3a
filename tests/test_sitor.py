"""SITOR-B FEC + NAVTEX framing tests (loopback through the encoder)."""

import numpy as np

from openwebrx_tpu.digimodes.sitor import (
    SitorBDecoder, NavtexDecoder, encode_fec, CODE_TO_ITA2, weight,
)


def words_to_bits(words):
    bits = []
    for w in words:
        bits.extend((w >> i) & 1 for i in range(7))
    return np.array(bits, np.uint8)


class TestSitorB:
    def test_roundtrip(self):
        words = encode_fec("THE QUICK BROWN FOX 123")
        dec = SitorBDecoder()
        text = dec.feed_bits(words_to_bits(words))
        assert "THE QUICK BROWN FOX 123" in text

    def test_dx_error_recovered_from_rx(self):
        words = encode_fec("HELLO WORLD")
        # corrupt one DX slot (even index) to an invalid weight
        words[10] ^= 0x01  # single bit flip → weight ≠ 4, always invalid
        assert weight(words[10]) != 4 or words[10] not in CODE_TO_ITA2
        dec = SitorBDecoder()
        text = dec.feed_bits(words_to_bits(words))
        assert "HELLO WORLD" in text

    def test_streamed_in_chunks(self):
        words = encode_fec("CHUNKED STREAM OK")
        bits = words_to_bits(words)
        dec = SitorBDecoder()
        out = ""
        for i in range(0, len(bits), 11):
            out += dec.feed_bits(bits[i: i + 11])
        assert "CHUNKED STREAM OK" in out


class TestNavtex:
    def test_message_framing(self):
        payload = "ZCZC FA01\r\nNAV WARNING TEST\r\nNNNN"
        words = encode_fec(payload)
        messages = []
        dec = NavtexDecoder(messages.append)
        dec.feed_bits(words_to_bits(words))
        assert messages, "no NAVTEX message parsed"
        msg = messages[0]
        assert msg["station"] == "F"
        assert msg["type"] == "A"
        assert msg["number"] == "01"
        assert "NAV WARNING TEST" in msg["message"]
