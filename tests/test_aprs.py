"""APRS stack tests: KISS, AX.25, APRS formats, subprocess pipelines."""

import sys

import pytest

from openwebrx_tpu.aprs import KissDeframer, parse_ax25_frame, AprsParser
from openwebrx_tpu.aprs.kiss import kiss_escape, FEND, FESC


def encode_address(call: str, ssid: int = 0, last: bool = False,
                   visited: bool = False) -> bytes:
    field = bytearray((call.ljust(6)[i].upper().encode()[0] << 1) for i in range(6))
    octet = 0x60 | (ssid << 1)
    if last:
        octet |= 0x01
    if visited:
        octet |= 0x80
    field.append(octet)
    return bytes(field)


def build_ui_frame(source, destination, path, info: bytes) -> bytes:
    frame = bytearray()
    frame += encode_address(destination)
    frame += encode_address(source[0], source[1] if len(source) > 1 else 0,
                            last=not path)
    for i, (call, ssid) in enumerate(path):
        frame += encode_address(call, ssid, last=(i == len(path) - 1),
                                visited=True)
    frame += bytes([0x03, 0xF0])
    frame += info
    return bytes(frame)


class TestKiss:
    def test_roundtrip_with_escapes(self):
        payload = bytes([1, 2, FEND, 3, FESC, 4])
        wire = kiss_escape(payload)
        frames = list(KissDeframer().parse(wire))
        assert frames == [payload]

    def test_split_across_feeds(self):
        payload = b"hello world"
        wire = kiss_escape(payload)
        d = KissDeframer()
        out = list(d.parse(wire[:5])) + list(d.parse(wire[5:]))
        assert out == [payload]


class TestAx25:
    def test_parse_addresses_and_path(self):
        frame = build_ui_frame(("N0CALL", 9), "APRS",
                               [("WIDE1", 1), ("WIDE2", 2)], b"!test")
        parsed = parse_ax25_frame(frame)
        assert parsed["source"] == "N0CALL-9"
        assert parsed["destination"] == "APRS"
        assert parsed["path"] == ["WIDE1-1*", "WIDE2-2*"]
        assert parsed["data"] == b"!test"


class TestAprsParser:
    def test_plain_position(self):
        info = b"!4903.50N/07201.75W-Test station"
        frame = parse_ax25_frame(build_ui_frame(("N0CALL", 0), "APRS", [], info))
        out = AprsParser().parse(frame)
        assert abs(out["lat"] - 49.0583) < 0.001
        assert abs(out["lon"] + 72.0292) < 0.001
        assert out["symbol"] == "-"
        assert out["comment"] == "Test station"

    def test_timestamped_position(self):
        info = b"@092345z4903.50N/07201.75W>comment"
        frame = parse_ax25_frame(build_ui_frame(("AB1CD", 7), "APRS", [], info))
        out = AprsParser().parse(frame)
        assert out["timestamp"] == "092345z"
        assert abs(out["lat"] - 49.0583) < 0.001

    def test_compressed_position(self):
        # compressed position for roughly 49.5, -72.75 (from the APRS spec
        # worked example format)
        info = b"!/5L!!<*e7> sTComment"
        frame = parse_ax25_frame(build_ui_frame(("AB1CD", 0), "APRS", [], info))
        out = AprsParser().parse(frame)
        assert out is not None
        assert 49 < out["lat"] < 50
        assert -73 < out["lon"] < -72

    def test_weather(self):
        info = b"!4903.50N/07201.75W_180/010g015t068h50b10201wx"
        frame = parse_ax25_frame(build_ui_frame(("WX1", 0), "APRS", [], info))
        out = AprsParser().parse(frame)
        wx = out["weather"]
        assert wx["winddirection"] == 180
        assert wx["windspeed"] == 10
        assert abs(wx["temperature"] - 20) < 0.1   # 68°F = 20°C
        assert wx["humidity"] == 50

    def test_message(self):
        info = b":BLN1     :Bulletin text here"
        frame = parse_ax25_frame(build_ui_frame(("OP1", 0), "APRS", [], info))
        out = AprsParser().parse(frame)
        assert out["type"] == "message"
        assert out["adressee"] == "BLN1"
        assert out["message"] == "Bulletin text here"


class TestPipeline:
    def test_line_pipeline(self):
        from openwebrx_tpu.services.pipeline import SubprocessPipeline
        lines = []
        p = SubprocessPipeline([sys.executable, "-u", "-c",
                                "import sys\nfor l in sys.stdin: "
                                "print('GOT:'+l.strip(), flush=True)"],
                               lines.append)
        p.feed(b"hello\nworld\n")
        import time
        deadline = time.time() + 5
        while len(lines) < 2 and time.time() < deadline:
            time.sleep(0.05)
        p.close()
        assert lines == [b"GOT:hello", b"GOT:world"]

    def test_json_pipeline(self):
        from openwebrx_tpu.services.pipeline import JsonLinePipeline
        events = []
        p = JsonLinePipeline([sys.executable, "-u", "-c",
                              "print('{\"model\":\"test\",\"id\":42}', flush=True)"],
                             events.append)
        import time
        deadline = time.time() + 5
        while not events and time.time() < deadline:
            time.sleep(0.05)
        p.close()
        assert events == [{"model": "test", "id": 42}]
