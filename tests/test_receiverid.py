"""Receiver-ID challenge/response signing tests."""

import hashlib
import hmac

from openwebrx_tpu.core.config import Config
from openwebrx_tpu.core.receiverid import (
    Key, KeyChallenge, KeyError_, response_header, sign_challenge,
)

SECRET = "ab" * 32
KEY = f"test-{'12' * 16}-{SECRET}"
CHALLENGE = f"test-{'12' * 16}-{'34' * 16}"


class TestReceiverId:
    def test_key_parse_roundtrip(self):
        k = Key.parse(KEY)
        assert k.source == "test" and k.id == "12" * 16 and k.secret == SECRET

    def test_invalid_key_raises(self):
        import pytest
        with pytest.raises(KeyError_):
            Key.parse("not-a-key")

    def test_sign_challenge_matches_manual_hmac(self):
        k = Key.parse(KEY)
        c = KeyChallenge.parse(CHALLENGE)
        out = sign_challenge(c, k, now=1000000000)
        source, kid, t_hex, sig = out.split("-")
        assert source == "test" and kid == "12" * 16
        time_bytes = (1000000000).to_bytes(4, "big")
        assert t_hex == time_bytes.hex()
        mac = hmac.new(bytes.fromhex(SECRET), digestmod=hashlib.sha256)
        mac.update(bytes.fromhex("34" * 16))
        mac.update(time_bytes)
        assert sig == mac.hexdigest()

    def test_response_header_filters_unknown(self):
        from openwebrx_tpu.core.property import PropertyLayer
        layer = PropertyLayer(receiver_keys=[KEY])
        Config.get().add_layer(0, layer)
        try:
            hdr = f"ReceiverId {CHALLENGE},other-{'ff' * 16}-{'00' * 16}"
            out = response_header(hdr, now=1000000000)
            parts = out.split(",")
            assert len(parts) == 1 and parts[0].startswith("test-")
        finally:
            Config.get().remove_layer(layer)

    def test_no_keys_empty_response(self):
        assert response_header(f"ReceiverId {CHALLENGE}", now=0) == ""
