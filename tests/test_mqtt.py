"""MQTT reporter tests against an in-process fake broker."""

import json
import socket
import struct
import threading

from openwebrx_tpu.reporting.mqtt import (
    MqttClient, MqttReporter, connect_packet, publish_packet,
)


class FakeBroker:
    """Accepts one client, answers CONNACK, records PUBLISH frames."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.published = []
        self.connect_frames = []
        self._done = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        conn, _ = self.sock.accept()
        conn.settimeout(5)
        try:
            while True:
                hdr = conn.recv(2)
                if len(hdr) < 2:
                    break
                ptype, length = hdr[0], hdr[1]
                # remaining-length continuation bytes
                mult = 128
                while length >= 0 and hdr[-1] & 0x80:
                    nxt = conn.recv(1)
                    hdr += nxt
                    length = (length & 0x7F) + nxt[0] * mult
                    mult *= 128
                body = b""
                while len(body) < length:
                    body += conn.recv(length - len(body))
                if ptype == 0x10:  # CONNECT
                    self.connect_frames.append(body)
                    conn.sendall(bytes([0x20, 0x02, 0x00, 0x00]))
                elif ptype == 0x30:  # PUBLISH
                    tlen = struct.unpack(">H", body[:2])[0]
                    topic = body[2:2 + tlen].decode()
                    self.published.append((topic, body[2 + tlen:]))
                elif ptype == 0xC0:  # PINGREQ
                    conn.sendall(bytes([0xD0, 0x00]))
                elif ptype == 0xE0:  # DISCONNECT
                    break
        except OSError:
            pass
        finally:
            conn.close()
            self._done.set()

    def wait_closed(self, timeout=5):
        self._done.wait(timeout)
        self.sock.close()


class TestPacketEncoding:
    def test_connect_packet_shape(self):
        pkt = connect_packet("cid", "user", "pass")
        assert pkt[0] == 0x10
        assert b"MQTT" in pkt and b"cid" in pkt and b"user" in pkt

    def test_publish_packet_topic(self):
        pkt = publish_packet("a/b", b"xyz")
        assert pkt[0] == 0x30
        assert pkt.endswith(b"xyz")
        tlen = struct.unpack(">H", pkt[2:4])[0]
        assert pkt[4:4 + tlen] == b"a/b"

    def test_remaining_length_multibyte(self):
        pkt = publish_packet("t", b"x" * 300)
        # 2-byte varint: low byte has continuation bit
        assert pkt[1] & 0x80


class TestMqttReporter:
    def test_spot_published_to_mode_topic(self):
        broker = FakeBroker()
        rep = MqttReporter(f"127.0.0.1:{broker.port}", topic="rx")
        rep.spot({"mode": "FT8", "callsign": "AB1CD", "db": -10})
        rep.stop()
        broker.wait_closed()
        assert len(broker.published) == 1
        topic, payload = broker.published[0]
        assert topic == "rx/FT8"
        assert json.loads(payload)["callsign"] == "AB1CD"

    def test_auth_fields_sent(self):
        broker = FakeBroker()
        client = MqttClient("127.0.0.1", broker.port, "cid",
                            username="u1", password="p1")
        client.connect()
        client.disconnect()
        broker.wait_closed()
        assert any(b"u1" in f and b"p1" in f for f in broker.connect_frames)

    def test_publish_failure_does_not_raise(self):
        # no broker listening: spot() must swallow the error
        rep = MqttReporter("127.0.0.1:1")
        rep.spot({"mode": "FT8"})
        rep.stop()
