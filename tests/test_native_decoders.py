"""Round-trip tests for the native (binary-free) packet/pager decoders."""

import numpy as np
import pytest

from openwebrx_tpu.digimodes.afsk import (
    Afsk1200Demodulator, SameDecoder, afsk_modulate, crc16_x25, hdlc_frame,
)
from openwebrx_tpu.digimodes.pocsag import (
    PageDecoder, PocsagDecoder, bch_encode, pocsag_modulate,
)


def ax25_ui_frame(source: str, dest: str, info: bytes) -> bytes:
    def addr(call: str, last: bool) -> bytes:
        call, _, ssid = call.partition("-")
        raw = bytes((ord(c) << 1) for c in call.ljust(6))
        return raw + bytes([0x60 | (int(ssid or 0) << 1) | (1 if last else 0)])

    return addr(dest, False) + addr(source, True) + b"\x03\xf0" + info


def nrzi_to_afsk(nrzi_levels, rate=12000, baud=1200):
    bits = np.asarray(nrzi_levels, dtype=bool)
    return afsk_modulate(bits, rate, baud, 1200, 2200)


class TestCrc:
    def test_known_vector(self):
        # CRC-16/X.25 of "123456789" is 0x906E
        assert crc16_x25(b"123456789") == 0x906E


class TestAfsk1200:
    def make_signal(self, frame_bytes, noise=0.0, seed=0):
        nrzi = hdlc_frame(frame_bytes)
        audio = nrzi_to_afsk(nrzi)
        if noise:
            rng = np.random.default_rng(seed)
            audio = audio + rng.standard_normal(audio.shape) * noise
        return audio

    def test_roundtrip_clean(self):
        frame = ax25_ui_frame("N0CALL-7", "APRS", b"!4903.50N/07201.75W-Test")
        audio = self.make_signal(frame)
        demod = Afsk1200Demodulator()
        frames = demod.process(audio)
        assert frames == [frame]

    def test_roundtrip_noisy_and_blockwise(self):
        frame = ax25_ui_frame("W1AW-5", "BEACON", b">hello from the tests")
        audio = self.make_signal(frame, noise=0.3, seed=3)
        demod = Afsk1200Demodulator()
        frames = []
        for k in range(0, len(audio), 997):          # odd block size
            frames.extend(demod.process(audio[k: k + 997]))
        assert frames == [frame]

    def test_two_frames_back_to_back(self):
        f1 = ax25_ui_frame("AA1AA", "APRS", b":msg one")
        f2 = ax25_ui_frame("BB2BB", "APRS", b":msg two")
        audio = np.concatenate([self.make_signal(f1), self.make_signal(f2)])
        demod = Afsk1200Demodulator()
        assert demod.process(audio) == [f1, f2]

    def test_corrupted_frame_rejected(self):
        frame = ax25_ui_frame("N0CALL", "APRS", b"payload")
        audio = self.make_signal(frame)
        audio[1500:1700] = 0.0                        # chop mid-frame
        demod = Afsk1200Demodulator()
        assert demod.process(audio) == []


class TestPocsag:
    def test_bch_encode_sync_word(self):
        # the frame sync codeword is itself a valid BCH codeword
        assert bch_encode(0x7CD215D8 >> 11) == 0x7CD215D8

    @pytest.mark.parametrize("baud", [512, 1200, 2400])
    def test_alpha_roundtrip(self, baud):
        audio = pocsag_modulate([(1234568, 3, "HELLO TPU", "alpha")],
                                baud=baud)
        lines = []
        dec = PocsagDecoder(baud, on_line=lines.append)
        dec.process(audio)
        dec.process(np.zeros(4000))
        dec.close()
        assert any("Address: 1234568" in l and "HELLO TPU" in l
                   for l in lines), lines

    def test_numeric_roundtrip(self):
        audio = pocsag_modulate([(99, 0, "0123-456789", "numeric")])
        lines = []
        dec = PocsagDecoder(1200, on_line=lines.append)
        dec.process(audio)
        dec.close()
        assert any("Numeric:  0123-456789" in l for l in lines), lines

    def test_tone_only_page(self):
        audio = pocsag_modulate([(42, 1, None, None)])
        lines = []
        dec = PocsagDecoder(1200, on_line=lines.append)
        dec.process(audio)
        dec.close()
        assert any("Address:      42  Function: 1" in l for l in lines), lines

    def test_bit_error_correction(self):
        audio = pocsag_modulate([(1234568, 3, "CORRECTED", "alpha")])
        rng = np.random.default_rng(1)
        audio = audio + rng.standard_normal(audio.shape) * 0.25
        lines = []
        dec = PocsagDecoder(1200, on_line=lines.append)
        dec.process(audio)
        dec.close()
        assert any("CORRECTED" in l for l in lines), lines

    def test_inverted_polarity(self):
        audio = -pocsag_modulate([(7, 0, None, None)])
        lines = []
        dec = PocsagDecoder(1200, on_line=lines.append)
        dec.process(audio)
        dec.close()
        assert any("Address:       7" in l for l in lines), lines

    def test_page_decoder_multi_baud(self):
        a512 = pocsag_modulate([(11, 1, None, None)], baud=512)
        a2400 = pocsag_modulate([(22, 2, None, None)], baud=2400)
        gap = np.zeros(6000)
        lines = []
        dec = PageDecoder(on_line=lines.append)
        dec.process(np.concatenate([a512, gap, a2400]))
        dec.close()
        text = "\n".join(lines)
        assert "POCSAG512" in text and "POCSAG2400" in text

    def test_parses_with_page_parser(self):
        from openwebrx_tpu.services.toolbox import PageParser
        audio = pocsag_modulate([(31337, 3, "PARSE ME", "alpha")])
        events = []
        parser = PageParser(events.append)
        dec = PocsagDecoder(1200,
                            on_line=lambda l: parser.parse(l.encode()))
        dec.process(audio)
        dec.close()
        assert events and events[0]["address"] == 31337
        assert events[0]["message"].strip() == "PARSE ME"


class TestSame:
    def same_audio(self, text, rate=12000):
        data = bytes([0xAB] * 16) + text.encode()
        bits = []
        for byte in data:
            bits.extend((byte >> i) & 1 for i in range(8))
        baud = 520.0 + 5.0 / 6.0
        return afsk_modulate(bits, rate, baud, 2083.0 + 1.0 / 3.0, 1562.5)

    def test_header_roundtrip(self):
        header = "ZCZC-WXR-RWT-012057+0030-2771935-KRAH/NWS-"
        audio = self.same_audio(header)
        dec = SameDecoder()
        lines = dec.process(audio)
        if not lines:
            line = dec.flush()
            lines = [line] if line else []
        assert lines and header in lines[0]

    def test_feeds_eas_parser(self):
        from openwebrx_tpu.services.toolbox import EasParser
        events = []
        parser = EasParser(events.append)
        header = "ZCZC-EAS-RMT-024031+0100-1181503-WTSP/TV-"
        dec = SameDecoder()
        lines = dec.process(self.same_audio(header))
        tail = dec.flush()
        if tail:
            lines.append(tail)
        for line in lines:
            parser.parse(line.encode())
        assert events and events[0]["raw"].startswith("ZCZC-EAS-RMT")


class TestSelCall:
    @pytest.mark.parametrize("protocol", ["ZVEI1", "EEA", "CCIR"])
    def test_roundtrip(self, protocol):
        from openwebrx_tpu.digimodes.selcall import (
            SelCallDecoder, selcall_modulate,
        )
        audio = selcall_modulate(protocol, "12345")
        lines = SelCallDecoder().process(audio)
        assert f"{protocol}: 12345" in lines, lines

    def test_repeated_digit_uses_repeat_tone(self):
        from openwebrx_tpu.digimodes.selcall import (
            SelCallDecoder, selcall_modulate,
        )
        audio = selcall_modulate("ZVEI1", "11223")
        lines = SelCallDecoder().process(audio)
        assert "ZVEI1: 11223" in lines, lines

    def test_noise_produces_nothing(self):
        from openwebrx_tpu.digimodes.selcall import SelCallDecoder
        rng = np.random.default_rng(0)
        lines = SelCallDecoder().process(rng.standard_normal(48000) * 0.3)
        assert lines == []


class TestExecModeNativePath:
    def test_page_service_runs_native(self):
        from openwebrx_tpu.services.exec_modes import (
            ExecModeService, NativeDecoderPipeline,
        )
        events = []
        svc = ExecModeService("page", events.append)
        try:
            assert isinstance(svc.pipeline, NativeDecoderPipeline)
            audio = pocsag_modulate([(777, 3, "VIA SERVICE", "alpha")])
            pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
            svc.feed(pcm)
            svc.close()
        finally:
            svc.close()
        assert any(e.get("address") == 777 for e in events), events

    def test_packet_service_runs_native(self):
        from openwebrx_tpu.services.exec_modes import (
            ExecModeService, NativeDecoderPipeline,
        )
        events = []
        svc = ExecModeService("packet", events.append)
        try:
            assert isinstance(svc.pipeline, NativeDecoderPipeline)
            frame = ax25_ui_frame("K1TST-9", "APRS", b">native path")
            audio = nrzi_to_afsk(hdlc_frame(frame))
            pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()
            svc.feed(pcm)
        finally:
            svc.close()
        assert any(e.get("source") == "K1TST-9" for e in events), events

    def test_mode_available_without_binaries(self):
        from openwebrx_tpu.services.exec_modes import mode_available
        for mode in ("packet", "page", "selcall", "eas"):
            assert mode_available(mode)
