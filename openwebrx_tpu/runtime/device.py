"""DeviceRuntime: one SDR device's compute loop.

The TPU-side replacement for the reference's per-device fan-out machinery
(reference ``owrx/fft.py`` SpectrumThread + per-client ``owrx/dsp.py``
DspManagers): ONE thread drains the source's IQ block queue, runs the
shared waterfall program and every mode-bucketed ChannelBank, then fans
results out to subscribers on the host.  Adding a listener = taking a bank
slot (no recompile); a new MODE = a new bank (cached compile).

Outputs delivered to subscriber callbacks (called on the runtime thread —
subscribers must be quick / enqueue):
  waterfall(rows_float32_db)           per waterfall subscriber
  channel handle: audio(bytes), smeter(float_db), meta(dict)
"""

from __future__ import annotations

import logging
import os
import threading

import numpy as np

from openwebrx_tpu.models.receiver import FftChain, MODE_BANDPASS
from openwebrx_tpu.models.stages import plan_block_size
from openwebrx_tpu.ops.adpcm import SyncFramer
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.bank import ChannelBank
from openwebrx_tpu.runtime.chain import Program
from openwebrx_tpu.sources.base import SdrSource

logger = logging.getLogger(__name__)

# modes sharing a chain structure share a bank (lsb/usb/cw are all SSB
# chains; their per-channel bandpasses differ, which the bank supports)
BANK_BUCKET = {
    "nfm": "nfm", "am": "am", "sam": "sam", "wfm": "wfm",
    "lsb": "ssb", "usb": "ssb", "cw": "ssb",
    "rawam": "rawam", "usbd": "usbd",
    # raw synchronous AM shares the SAm chain; its wide ±10 kHz bandpass is
    # per-channel state (reference RawSAm, csdr/chain/analog.py:137-170)
    "rawsam": "sam",
}
BUCKET_CHAIN_MODE = {"nfm": "nfm", "am": "am", "sam": "sam", "wfm": "wfm",
                     "ssb": "usb", "rawam": "rawam", "usbd": "usbd"}


class SecondaryBank:
    """All same-mode secondary digimode listeners of a device share ONE
    batched Program (VERDICT r4 item 8): N PSK31 cursors are N rows of a
    (N,)-batched chain — per-listener offset/carrier are traced parameter
    arrays, so attaching a listener never recompiles (growing beyond
    capacity does, capacity doubles, amortized).  The host-side bits→text
    decoders stay per-handle (they carry per-listener text state).

    Reference analog: one secondary demodulator chain per client
    (owrx/dsp.py:682-797) — the same per-client scaling failure the
    ChannelBank removes for audio.
    """

    def __init__(self, runtime: "DeviceRuntime", mode: str, capacity: int = 2):
        from openwebrx_tpu.models.secondary import SECONDARY_FACTORY
        self.runtime = runtime
        self.mode = f"bank:{mode}"
        self.secondary_mode = mode
        self.capacity = int(capacity)
        self.chain = SECONDARY_FACTORY[mode](runtime.in_rate)
        self._offsets = np.zeros(self.capacity, np.float32)
        # chains with a built-in subcarrier (SSTV/FAX park the fine shift
        # at 1900 Hz) keep that as the per-slot default
        fine = getattr(self.chain, "fine_shift", None)
        self._default_carrier = 0.0
        if fine is not None:
            from openwebrx_tpu.models.secondary import IF_RATE
            self._default_carrier = -float(np.asarray(fine._rate)) * IF_RATE
        self._carriers = np.full(self.capacity, self._default_carrier,
                                 np.float32)
        self._active = np.zeros(self.capacity, bool)
        self.members: list["SecondaryHandle | None"] = [None] * self.capacity
        self._build_program()
        self._pending: list[np.ndarray] = []
        self._pending_len = 0

    def _build_program(self):
        from openwebrx_tpu.models.stages import plan_block_size as _pbs
        from openwebrx_tpu.ops.formats import Format as _F, StreamSpec as _S
        spec = _S(_F.COMPLEX_FLOAT, self.runtime.in_rate)
        self.block = _pbs(self.chain, spec, 0.1)
        self._push_params()
        self.program = Program(self.chain, spec, self.block,
                               batch_shape=(self.capacity,))

    def _push_params(self):
        self.chain.selector.shift.set_rate(-self._offsets / self.runtime.in_rate)
        fine = getattr(self.chain, "fine_shift", None)
        if fine is not None:
            from openwebrx_tpu.models.secondary import IF_RATE
            fine.set_rate(-self._carriers / IF_RATE)

    def attach(self, handle: "SecondaryHandle", offset_hz: float) -> int:
        free = np.flatnonzero(~self._active)
        if len(free) == 0:
            self._grow()
            free = np.flatnonzero(~self._active)
        slot = int(free[0])
        self._active[slot] = True
        self._offsets[slot] = offset_hz
        self._carriers[slot] = self._default_carrier
        self.members[slot] = handle
        self._push_params()
        return slot

    def detach(self, handle: "SecondaryHandle"):
        if handle.slot is not None and self.members[handle.slot] is handle:
            self._active[handle.slot] = False
            self.members[handle.slot] = None
            self._offsets[handle.slot] = 0.0
            self._push_params()
        if not self._active.any():
            drop = getattr(self.runtime, "_drop_secondary_bank", None)
            if drop is not None:
                drop(self)

    def _grow(self):
        """Double capacity: recompile (cached per capacity), device-side
        chain state restarts (the host text decoders carry on)."""
        new_cap = self.capacity * 2
        self._offsets = np.resize(self._offsets, new_cap)
        self._carriers = np.resize(self._carriers, new_cap)
        self._offsets[self.capacity:] = 0.0
        self._carriers[self.capacity:] = self._default_carrier
        self._active = np.concatenate(
            [self._active, np.zeros(self.capacity, bool)])
        self.members = self.members + [None] * self.capacity
        self.capacity = new_cap
        self._build_program()
        self._pending = []
        self._pending_len = 0

    def set_offset(self, slot: int, offset_hz: float):
        self._offsets[slot] = offset_hz
        self._push_params()

    def set_carrier(self, slot: int, carrier_hz: float):
        self._carriers[slot] = carrier_hz
        self._push_params()

    def feed(self, block: np.ndarray):
        self._pending.append(block)
        self._pending_len += len(block)
        while self._pending_len >= self.block:
            buf = np.concatenate(self._pending)
            chunk, rest = buf[: self.block], buf[self.block:]
            self._pending = [rest] if len(rest) else []
            self._pending_len = len(rest)
            y, aux = self.program.process(chunk)
            y = np.asarray(y)
            rows = None
            for key, r in aux.items():
                if key.endswith("secondary_fft.rows"):
                    rows = np.asarray(r)
                    break
            for slot in np.flatnonzero(self._active):
                handle = self.members[slot]
                if handle is not None:
                    handle._deliver(y[slot],
                                    rows[slot] if rows is not None else None)


class SecondaryHandle:
    """A digimode decoder attached to a listener's frequency (reference
    secondary demodulator, owrx/dsp.py:682-797).

    A slot in the device's per-mode SecondaryBank (one batched program for
    all same-mode listeners), with the host-side bits→text decoder
    attached per handle.
    """

    def __init__(self, runtime: "DeviceRuntime", mode: str, offset_hz: float,
                 bank: "SecondaryBank | None" = None):
        self.runtime = runtime
        self.mode = mode
        # standalone use (tests, direct embedding): own single-slot bank
        self.bank = bank if bank is not None \
            else SecondaryBank(runtime, mode, capacity=1)
        self.slot = self.bank.attach(self, offset_hz)
        self.text_cb = None
        self.fft_cb = None            # secondary FFT rows (0x03 frames)
        self._decoder = self._make_decoder()

    @property
    def chain(self):
        return self.bank.chain

    def _make_decoder(self):
        from openwebrx_tpu.digimodes.cw import CwDecoder
        from openwebrx_tpu.digimodes.psk import VaricodeDecoder, dbpsk_bits
        from openwebrx_tpu.digimodes.rtty import RttyFramer
        from openwebrx_tpu.models.secondary import CwChain

        if self.mode.startswith("bpsk"):
            vd = VaricodeDecoder()
            self._last_symbol = None

            def decode(symbols):
                symbols = np.asarray(symbols)
                if self._last_symbol is not None:
                    symbols = np.concatenate([[self._last_symbol], symbols])
                self._last_symbol = symbols[-1] if len(symbols) else None
                return vd.decode(dbpsk_bits(symbols))
            return decode
        if self.mode.startswith("rtty"):
            framer = RttyFramer()
            return lambda symbols: framer.decode(
                (np.asarray(symbols).real > 0).astype(np.uint8))
        if self.mode == "cwdecoder":
            cw = CwDecoder(CwChain.ENV_RATE)
            return lambda env: cw.decode(np.asarray(env))
        if self.mode == "cwskimmer":
            from openwebrx_tpu.digimodes.cw import CwSkimmer
            from openwebrx_tpu.models.secondary import CwSkimmerChain
            skimmer = CwSkimmer(self.chain.bin_hz, self.chain.env_rate)

            def decode(frames):
                # reference csdr-cwskimmer line format: '<freq>:<text>'
                # (owrx/toolbox.py:379), freq relative to passband center
                return "".join(f"{int(freq)}:{text}\n" for freq, text
                               in skimmer.process(np.asarray(frames)))
            return decode
        if self.mode == "sitorb":
            from openwebrx_tpu.digimodes.sitor import SitorBDecoder
            sitor = SitorBDecoder()
            return lambda symbols: sitor.feed_bits(
                (np.asarray(symbols).real > 0).astype(np.uint8))
        if self.mode in ("navtex", "dsc"):
            import json as _json

            events: list[dict] = []
            if self.mode == "navtex":
                from openwebrx_tpu.digimodes.sitor import NavtexDecoder
                inner = NavtexDecoder(events.append)
            else:
                from openwebrx_tpu.digimodes.dsc import DscDecoder
                inner = DscDecoder(events.append)

            def decode(symbols):
                inner.feed_bits((np.asarray(symbols).real > 0).astype(np.uint8))
                out = "".join(_json.dumps(m) + "\n" for m in events)
                events.clear()
                return out
            return decode
        if self.mode in ("sstv", "fax"):
            return self._make_image_decoder()
        return lambda y: ""

    def _make_image_decoder(self):
        """SSTV/FAX: host line assembly on the subcarrier-frequency stream;
        every image row goes to the panel as a JSON line (base64 pixels) and
        finished images land in shared storage (reference SstvParser /
        FaxParser flow, owrx/sstv.py:65, owrx/fax.py)."""
        import base64
        import json as _json

        lines: list[str] = []

        def emit(msg: dict):
            lines.append(_json.dumps(msg) + "\n")

        if self.mode == "sstv":
            from openwebrx_tpu.services.sstv import SstvDecoder

            state = {"decoder": None, "line": 0,
                     "mode": None, "width": 0, "height": 0}

            def on_mode(name, width, height):
                # VIS header decoded: announce like the reference binary
                # protocol does (owrx/sstv.py mode/width/height header)
                state.update(mode=name, width=width, height=height, line=0)
                emit({"mode": "SSTV", "sstv_mode": name,
                      "width": width, "height": height, "line": -1})

            def on_row(row):
                n = state["line"]
                state["line"] += 1
                emit({"mode": "SSTV", "sstv_mode": state["mode"] or "?",
                      "width": int(row.shape[0]),
                      "height": state["height"], "line": n,
                      "pixels": base64.b64encode(
                          np.asarray(row, np.uint8).tobytes()).decode()})
                if state["height"] and state["line"] >= state["height"]:
                    self._save_image(state["decoder"].image(), "sstv", emit)
                    state["decoder"] = SstvDecoder(on_row=on_row,
                                                   on_mode=on_mode)
                    state["line"] = 0

            state["decoder"] = SstvDecoder(on_row=on_row, on_mode=on_mode)

            def decode(y):
                state["decoder"].feed(np.asarray(y))
                out = "".join(lines)
                lines.clear()
                return out
            return decode

        from openwebrx_tpu.services.fax import FaxDecoder

        fax_state = {"line": 0}

        def on_fax_row(row):
            n = fax_state["line"]
            fax_state["line"] += 1
            # fax lines are wide (≈1500 px at 120 lpm); subsample 4× for the
            # wire, the canvas stretches horizontally
            sub = np.asarray(row, np.uint8)[::4]
            emit({"mode": "Fax", "width": int(sub.shape[0]), "line": n,
                  "pixels": base64.b64encode(sub.tobytes()).decode()})

        def on_fax_complete(path):
            fax_state["line"] = 0
            emit({"mode": "Fax", "complete": True,
                  "filename": os.path.basename(path)})

        from openwebrx_tpu.core.storage import Storage
        fax = FaxDecoder(on_row=on_fax_row, on_complete=on_fax_complete,
                         tmp_dir=Storage.shared().directory)

        def decode_fax(y):
            fax.feed(np.asarray(y))
            out = "".join(lines)
            lines.clear()
            return out
        return decode_fax

    def _save_image(self, img, prefix: str, emit):
        """Store a finished RGB/grey image as PNG (PGM/PPM fallback) in the
        shared file store and announce it (reference Storage.convert flow,
        owrx/storage.py:118-141)."""
        if img is None:
            return
        from openwebrx_tpu.core.storage import Storage
        from openwebrx_tpu.services.fax import convert_to_png

        img = np.asarray(img, np.uint8)
        store = Storage.shared()
        color = img.ndim == 3
        raw = store.new_file(f"{prefix.upper()}-image.{'ppm' if color else 'pgm'}")
        with open(raw, "wb") as f:
            magic = "P6" if color else "P5"
            f.write(f"{magic}\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            f.write(img.tobytes())
        png = convert_to_png(raw)
        emit({"mode": prefix.upper(), "complete": True,
              "filename": os.path.basename(png or raw)})

    def set_offset(self, offset_hz: float):
        self.bank.set_offset(self.slot, offset_hz)

    def set_carrier(self, carrier_hz: float):
        self.bank.set_carrier(self.slot, carrier_hz)

    def feed(self, block: np.ndarray):
        """Standalone-handle feed (single-slot bank); in the DeviceRuntime
        the per-mode SecondaryBank is fed once for all members."""
        self.bank.feed(block)

    def _deliver(self, y: np.ndarray, fft_rows: np.ndarray | None):
        """One bank block's results for this slot (called by SecondaryBank
        on the device thread)."""
        if self.fft_cb is not None and fft_rows is not None:
            from openwebrx_tpu.ops.adpcm import compress_fft_rows
            for payload in compress_fft_rows(np.asarray(fft_rows)):
                self.fft_cb(payload)
        text = self._decoder(y)
        if text and self.text_cb is not None:
            self.text_cb(text)


class IqServiceHandle:
    """A complex-IF tap: Selector-only chain at an arbitrary IF rate, for
    external decoders that consume IQ (dumphfdl 12k, dumpvdl2 105k,
    rtl_433 250k — reference csdr/chain/aircraft.py, toolbox.py).

    Own block cadence (accumulator), like SecondaryHandle.  iq_cb receives
    bytes in the requested wire format ('cf32' or 'cs16').
    """

    def __init__(self, runtime: "DeviceRuntime", if_rate: float,
                 offset_hz: float, wire_format: str = "cs16"):
        from openwebrx_tpu.models.selector import Selector
        from openwebrx_tpu.models.stages import plan_block_size as _pbs
        from openwebrx_tpu.ops.formats import Format as _F, StreamSpec as _S

        self.runtime = runtime
        self.if_rate = float(if_rate)
        self.mode = f"iq@{int(if_rate)}"
        self.wire_format = wire_format
        self.chain = Selector(runtime.in_rate, if_rate, with_squelch=False)
        self.chain.set_frequency_offset(offset_hz)
        spec = _S(_F.COMPLEX_FLOAT, runtime.in_rate)
        self.block = _pbs(self.chain, spec, 0.1)
        self.program = Program(self.chain, spec, self.block)
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self.iq_cb = None

    def set_offset(self, offset_hz: float):
        self.chain.set_frequency_offset(offset_hz)

    def feed(self, block: np.ndarray):
        self._pending.append(block)
        self._pending_len += len(block)
        while self._pending_len >= self.block:
            buf = np.concatenate(self._pending)
            chunk, rest = buf[: self.block], buf[self.block:]
            self._pending = [rest] if len(rest) else []
            self._pending_len = len(rest)
            y, _ = self.program.process(chunk)
            if self.iq_cb is None:
                continue
            iq = np.asarray(y)
            if self.wire_format == "cs16":
                interleaved = np.empty(2 * len(iq), np.int16)
                scaled = np.clip(iq * 32767.0, -32768, 32767)
                interleaved[0::2] = scaled.real.astype(np.int16)
                interleaved[1::2] = scaled.imag.astype(np.int16)
                self.iq_cb(interleaved.tobytes())
            else:
                self.iq_cb(iq.astype(np.complex64).tobytes())


class M17MetaTap:
    """Native M17 link-layer metadata running NEXT TO the external audio
    decoder (round 5): the listener's EXISTING 48 kHz IQ channel output →
    DvSymbolChain (at IF rate — no second full-rate downconversion per
    listener) → digimodes/m17.M17Decoder (LSF/LICH) → meta callback —
    src/dest callsigns and CAN reach the MetaPanel even when m17-demod is
    absent (the reference has no metadata at all without the binary,
    csdr/chain/m17.py).  Consumes the same cs16 wire bytes the subprocess
    gets (feed_cs16)."""

    mode = "m17meta"
    IF_RATE = 48000.0

    def __init__(self, meta_cb):
        from openwebrx_tpu.digimodes.m17 import M17Decoder
        from openwebrx_tpu.models.digital_voice import DV_FACTORY
        from openwebrx_tpu.models.stages import plan_block_size as _pbs
        from openwebrx_tpu.ops.formats import Format as _F, StreamSpec as _S
        self.chain = DV_FACTORY["m17"](self.IF_RATE)
        spec = _S(_F.COMPLEX_FLOAT, self.IF_RATE)
        self.block = _pbs(self.chain, spec, 0.1)
        self.program = Program(self.chain, spec, self.block)
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self.decoder = M17Decoder(meta_cb)

    def feed_cs16(self, data: bytes):
        """Interleaved int16 IQ at the 48 kHz IF (the wire format the
        external decoder consumes)."""
        s = np.frombuffer(data, np.int16).astype(np.float32) / 32767.0
        block = (s[0::2] + 1j * s[1::2]).astype(np.complex64)
        self._pending.append(block)
        self._pending_len += len(block)
        while self._pending_len >= self.block:
            buf = np.concatenate(self._pending)
            chunk, rest = buf[: self.block], buf[self.block:]
            self._pending = [rest] if len(rest) else []
            self._pending_len = len(rest)
            dibits, _ = self.program.process(chunk)
            try:
                self.decoder.feed(np.asarray(dibits).astype(np.uint8))
            except Exception:
                logger.exception("m17 frame decode failed")


class ExecAudioHandle:
    """A listener mode decoded by an external binary: complex IF from an
    IqServiceHandle → subprocess → s16 audio back to the client.

    Reference analogs: the PopenModule broadcast chains — Drm (dream),
    FreeDV (freedv_rx), M17 (m17-demod), HdRadio (nrsc5), Dablin
    (csdr/chain/{drm,freedv,m17,hdradio,dablin}.py).  Feature-gated on the
    binary; audio_cb receives raw s16 frames (compression handled by the
    connection layer as for service audio).

    Metadata feeders (``services/exec_meta.py``; VERDICT r2 task 6):
    DRM status arrives over dream's ``--status-socket`` unix socket, DAB
    ensemble/service labels (plus AFC feedback nudging the IQ shift) and
    HDR station info arrive on the decoder's stderr.  ``meta_cb(dict)``
    receives panels' metadata messages.
    """

    # mode → (if_rate, wire format, command builder, meta channel)
    MODES = {
        "drm": (48000, "cs16",
                lambda rate: ["dream", "-c", "6", "--sigsrate", str(int(rate)),
                              "--audsrate", "12000", "-I", "-", "-O", "-"],
                "drm_socket"),
        "freedv": (8000, "cs16",
                   lambda rate: ["freedv_rx", "1600", "-", "-"], None),
        "m17": (48000, "cs16",
                lambda rate: ["m17-demod", "-l"], None),
        "hdr": (744187, "cs16",
                lambda rate: ["nrsc5", "-r", "-", "-o", "-", "0"], "hdr"),
        "dab": (2048000, "cs16",
                lambda rate: ["dablin", "-s", "-p", "-"], "dab"),
    }

    def __init__(self, runtime: "DeviceRuntime", mode: str, offset_hz: float,
                 command_override=None):
        from openwebrx_tpu.services.pipeline import SubprocessPipeline

        if_rate, wire, cmd, meta_kind = self.MODES[mode]
        self.mode = mode
        self.runtime = runtime
        self.audio_cb = None
        self.meta_cb = None
        self._base_offset = float(offset_hz)
        self._drm_monitor = None
        self._drm_socket_path = None
        self._hdr = None
        self.pipeline = None
        if mode == "hdr" and command_override is None:
            # in-process decode through libnrsc5 when the library is
            # present (reference csdr/module/nrsc5.py binding) — no
            # subprocess, IQ flows straight from the TPU channel into the
            # decoder and 44.1 kHz audio/ID3/SIS come back via callbacks
            from openwebrx_tpu.services import hdradio
            if hdradio.available():
                self.iq = runtime.open_iq_channel(if_rate, offset_hz, wire)
                self._hdr = hdradio.HdRadioDecoder(
                    on_audio=self._on_audio_bytes, on_meta=self._on_meta)
                self.iq.iq_cb = self._hdr.feed
                return
        self.iq = runtime.open_iq_channel(if_rate, offset_hz, wire)
        if mode == "m17":
            # native link-layer metadata regardless of the binary — fed
            # the SAME cs16 IF stream as the subprocess (no second
            # full-rate program per listener)
            from openwebrx_tpu.services.meta import MetaParser
            self._m17_meta = MetaParser(self._on_meta)
            self._m17_tap = M17MetaTap(self._m17_meta.process)
        commandline = list(command_override or cmd(if_rate))
        on_stderr = None
        if meta_kind == "drm_socket":
            import tempfile
            self._drm_socket_path = os.path.join(
                tempfile.gettempdir(),
                f"owrx_drm_{os.getpid()}_{id(self):x}.sock")
            if command_override is None:
                commandline += ["--status-socket", self._drm_socket_path]
            from openwebrx_tpu.services.exec_meta import DrmStatusMonitor
            self._drm_monitor = DrmStatusMonitor(self._drm_socket_path,
                                                 self._on_meta)
            self._drm_monitor.start()
        elif meta_kind == "dab":
            from openwebrx_tpu.services.exec_meta import DabAfc, DabMetaParser
            self._afc = DabAfc(self._apply_afc)
            on_stderr = DabMetaParser(self._on_meta, self._afc).feed_line
        elif meta_kind == "hdr":
            from openwebrx_tpu.services.exec_meta import HdrMetaParser
            on_stderr = HdrMetaParser(self._on_meta).feed_line
        self.pipeline = SubprocessPipeline(
            commandline, self._on_audio_bytes, line_based=False,
            on_stderr_line=on_stderr)
        tap = getattr(self, "_m17_tap", None)
        if tap is not None:
            feed_pipe = self.pipeline.feed

            def _feed_both(data: bytes):
                feed_pipe(data)
                try:
                    tap.feed_cs16(data)
                except Exception:
                    logger.exception("m17 meta tap failed")
            self.iq.iq_cb = _feed_both
        else:
            self.iq.iq_cb = self.pipeline.feed

    def _on_audio_bytes(self, data: bytes):
        if self.audio_cb is not None:
            self.audio_cb(data, False)

    def _on_meta(self, meta: dict):
        if self.meta_cb is not None:
            self.meta_cb(meta)

    def _apply_afc(self, shift_hz: float):
        """DAB AFC: the ETI frontend's frequency-shift feedback nudges the
        channel NCO (reference csdr/chain/dablin.py MetaProcessor)."""
        self.iq.set_offset(self._base_offset + shift_hz)

    def set_offset(self, offset_hz: float):
        self._base_offset = float(offset_hz)
        afc = getattr(self, "_afc", None)
        if afc is not None:
            afc.reset()
        self.iq.set_offset(offset_hz)

    def close(self):
        if self._drm_monitor is not None:
            self._drm_monitor.stop()
            if self._drm_socket_path and os.path.exists(self._drm_socket_path):
                try:
                    os.unlink(self._drm_socket_path)
                except OSError:
                    pass
        self.runtime.release_secondary(self.iq)
        if self._hdr is not None:
            self._hdr.close()
        if self.pipeline is not None:
            self.pipeline.close()


class DigitalVoiceHandle:
    """DMR/YSF/D-Star/NXDN listener: the TPU runs the whole symbol path
    (discriminator → RRC matched filter → timing recovery → 4FSK slicer,
    ``models/digital_voice.py``); only the frame decoder + MBE vocoder are
    external, consuming one dibit byte per symbol on stdin and emitting
    s16 audio on stdout plus JSON metadata on a side fd.

    Reference analog: csdr/chain/digiham.py:14-73 (whole chain external
    there).  audio_cb(bytes, hd) like ExecAudioHandle; meta_cb(dict)
    delivers enriched metadata (owrx/meta.py flow).
    """

    def __init__(self, runtime: "DeviceRuntime", mode: str, offset_hz: float,
                 command_override=None):
        from openwebrx_tpu.models.digital_voice import DV_DECODERS, DV_FACTORY
        from openwebrx_tpu.models.stages import plan_block_size as _pbs
        from openwebrx_tpu.ops.formats import Format as _F, StreamSpec as _S
        from openwebrx_tpu.services.meta import MetaParser
        from openwebrx_tpu.services.pipeline import SubprocessPipeline

        self.runtime = runtime
        self.mode = mode
        self.audio_cb = None
        self.meta_cb = None
        self.chain = DV_FACTORY[mode](runtime.in_rate)
        self.chain.set_frequency_offset(offset_hz)
        spec = _S(_F.COMPLEX_FLOAT, runtime.in_rate)
        self.block = _pbs(self.chain, spec, 0.1)
        self.program = Program(self.chain, spec, self.block)
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self.meta_parser = MetaParser(self._on_meta)
        # NATIVE frame layer (round 5): DMR/YSF sync + FEC + LC decode run
        # in-process on the dibit stream, so talker metadata reaches the
        # MetaPanel with ZERO external binaries (digimodes/dmr.py,
        # digimodes/ysf.py; reference needs digiham, csdr/chain/digiham.py
        # :15-76).  The external pipeline still gets the dibits for the
        # AMBE vocoder audio when its binary exists.
        self._frames = None
        if mode == "dmr":
            from openwebrx_tpu.digimodes.dmr import DmrDecoder
            self._frames = DmrDecoder(self.meta_parser.process)
        elif mode == "ysf":
            from openwebrx_tpu.digimodes.ysf import YsfDecoder
            self._frames = YsfDecoder(self.meta_parser.process)
        elif mode == "dstar":
            from openwebrx_tpu.digimodes.dstar import DstarDecoder
            self._frames = DstarDecoder(self.meta_parser.process)
        elif mode == "nxdn":
            from openwebrx_tpu.digimodes.nxdn import NxdnDecoder
            self._frames = NxdnDecoder(self.meta_parser.process)
        self.pipeline = SubprocessPipeline(
            command_override or DV_DECODERS[mode], self._on_audio_bytes,
            line_based=False, on_meta_line=self.meta_parser.feed_line)
        with runtime._lock:
            runtime.secondary_handles.append(self)  # device feed path

    def _on_audio_bytes(self, data: bytes):
        if self.audio_cb is not None:
            self.audio_cb(data, False)

    def _on_meta(self, meta: dict):
        if self.meta_cb is not None:
            self.meta_cb(meta)

    def set_offset(self, offset_hz: float):
        self.chain.set_frequency_offset(offset_hz)

    def set_dial_frequency(self, freq: float):
        self.meta_parser.set_dial_frequency(freq)

    def feed(self, block: np.ndarray):
        self._pending.append(block)
        self._pending_len += len(block)
        while self._pending_len >= self.block:
            buf = np.concatenate(self._pending)
            chunk, rest = buf[: self.block], buf[self.block:]
            self._pending = [rest] if len(rest) else []
            self._pending_len = len(rest)
            dibits, _ = self.program.process(chunk)
            dib = np.asarray(dibits).astype(np.uint8)
            if self._frames is not None:
                try:
                    self._frames.feed(dib)       # native metadata path
                except Exception:
                    logger.exception("%s frame decode failed", self.mode)
            self.pipeline.feed(dib.tobytes())

    def close(self):
        self.runtime.release_secondary(self)
        self.pipeline.close()


class ChannelHandle:
    """A listener's handle on one bank slot (the per-client control surface
    the reference exposes through DspManager properties)."""

    def __init__(self, runtime: "DeviceRuntime", mode: str, slot: int):
        self.runtime = runtime
        self.mode = mode
        self.slot = slot
        self.bucket_key = BANK_BUCKET[mode]
        self.framer = SyncFramer()
        self.audio_cb = None
        self.smeter_cb = None
        self.rds_cb = None              # WFM only: redsea-style RDS events
        self._rds = None
        self._smeter_decim = 0

    # -- controls ---------------------------------------------------------
    @property
    def bank(self):
        return self.runtime.banks[self.bucket_key]

    def set_offset(self, offset_hz: float):
        if self.slot is None:
            return
        if self.bucket_key.startswith(("pfb:", "pfbi:")):
            # the new dial may not fit its PFB channel (edge-straddling
            # passband) or may collide with another dial's channel —
            # the runtime re-fits, migrating to a full-rate slot if needed
            self.runtime.retune_channelized(self, offset_hz)
            return
        # a full-rate slot retuning to a dial that fits the filterbank is
        # re-admitted (with hysteresis) so long-lived listeners converge
        # back onto the cheap path after an edge-straddling drag
        if self.runtime.try_pfb_readmit(self, offset_hz):
            return
        new_slot = self.bank.retune(self.slot, offset_hz)
        if new_slot is not None:
            self.slot = new_slot

    def set_squelch(self, level_db: float):
        if self.slot is not None:
            self.bank.set_squelch(self.slot, level_db)

    def set_bandpass(self, low_hz: float, high_hz: float):
        if self.slot is not None:
            self.bank.set_bandpass(self.slot, low_hz, high_hz)

    def set_nr(self, threshold_db: float):
        if self.slot is not None:
            self.bank.set_nr(self.slot, threshold_db)

    def set_mode(self, mode: str, offset_hz: float | None = None):
        """Mode switch = move to another bank (reference: chain surgery)."""
        self._rds = None
        self.runtime.switch_mode(self, mode, offset_hz)

    def feed_rds(self, baseband: np.ndarray):
        """RDS aux row from the WFM bank → native group decoder → rds_cb
        (accumulated redsea-style metadata, reference RdsParser flow)."""
        if self._rds is None:
            from openwebrx_tpu.digimodes.rds import RdsDecoder
            from openwebrx_tpu.models.analog import WFm
            from openwebrx_tpu.models.stages import RdsTapStage
            from openwebrx_tpu.services.toolbox import RdsParser
            parser = RdsParser(self.rds_cb)
            rate = WFm.fixed_if_rate / RdsTapStage.DECIMATION
            self._rds = RdsDecoder(rate, parser.parse)
        self._rds.process(baseband)

    def close(self):
        self.runtime.release_channel(self)


class DeviceRuntime:
    def __init__(self, source: SdrSource, fft_size: int = 4096, fft_fps: float = 9.0,
                 audio_rate: float = 12000.0, compression: str = "adpcm",
                 fft_compression: str = "adpcm", capacity: int = 16,
                 target_seconds: float = 0.1, pipeline_depth: int = 2,
                 pfb_capacity: int | None = None,
                 service_delivery_seconds: float = 0.3):
        # background service results are delivered in batches of roughly
        # this much signal: every coalesced device→host transfer saves a
        # serialized round trip on tunnel/PCIe transports, and background
        # decoders buffer seconds anyway (the FT8 chopper's unit is 15 s)
        self.service_delivery_seconds = float(service_delivery_seconds)
        # `capacity` sizes the full-rate banks (each slot there costs a
        # full-rate chain); `pfb_capacity` independently sizes the
        # filterbank banks, whose per-slot cost is a channel-rate row —
        # hundreds of PFB slots are cheap, hundreds of full-rate are not
        self.pfb_capacity = pfb_capacity
        # software pipeline depth: how many blocks may be in flight between
        # dispatch and completion.  Device→host result copies on a
        # tunnel-attached TPU take ~25-50 ms to land after issue (fixed
        # latency + ~45 MB/s wire); depth 2 shadows them with one full
        # block of real-time arrival, keeping the blocking read near zero
        # while adding at most one block of delivery latency.
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.fft_compression = fft_compression
        self.source = source
        self.audio_rate = audio_rate
        self.compression = compression
        self.capacity = capacity
        self.target_seconds = target_seconds
        self.in_rate = source.get_sample_rate()
        self.banks: dict[str, ChannelBank] = {}
        self._pfbi_infeasible: set[str] = set()
        self._pfb_m: dict[str, int] = {}
        self.handles: list[ChannelHandle] = []
        self.secondary_handles: list = []     # SecondaryBank/Iq/DV feeders
        self.secondary_banks: dict[str, SecondaryBank] = {}
        self.waterfall_subscribers: list = []
        self._lock = threading.RLock()
        self._running = False
        self._thread: threading.Thread | None = None

        # ONE device block must satisfy every mode bucket's chain (plus the
        # waterfall, which accepts any block): lcm of all bucket
        # requirements at this rate
        from math import gcd
        from openwebrx_tpu.models.receiver import ClientDemodulatorChain
        from openwebrx_tpu.models.stages import block_requirement
        spec = StreamSpec(Format.COMPLEX_FLOAT, self.in_rate)
        req = 1
        want = max(1, int(round(self.in_rate * target_seconds)))
        self.available_buckets = set()
        for bucket_mode in set(BUCKET_CHAIN_MODE.values()):
            try:
                proto = ClientDemodulatorChain(self.in_rate, audio_rate,
                                               bucket_mode, compression)
            except ValueError:
                # mode infeasible at this device rate (e.g. WFM's fixed
                # 250 kHz IF above the device sample rate) — not offered
                continue
            r = block_requirement(proto, spec)
            # only chains with a requirement near the latency target set the
            # device cadence; a long chain (WFM's resampler needs 0.2 s at
            # 2.4 MS/s) instead accumulates device chunks inside its bank
            # (ChannelBank.feed_dispatch), so ONE expensive mode doesn't
            # drag every listener's latency to its LCM
            if r <= 2 * want:
                req = req * r // gcd(req, r)
            self.available_buckets.add(
                next(b for b, m in BUCKET_CHAIN_MODE.items() if m == bucket_mode))
        # floor-round toward the latency target (never below one requirement)
        self.block = max(req, (want // req) * req)

        self.fft_chain = FftChain(fft_size, fft_fps,
                                  compress=(fft_compression == "adpcm"))
        self.fft_program = Program(self.fft_chain, spec, self.block)
        source.block_size = self.block

    # -- channels ---------------------------------------------------------
    def _get_bank(self, key: str) -> ChannelBank:
        """key = bucket name, or 'svc:<bucket>' for raw-audio service banks."""
        with self._lock:
            bank = self.banks.get(key)
            if bank is None:
                service = key.startswith("svc:")
                bucket = key.split(":", 1)[-1]
                # WFM listeners get HD audio (48 kHz, reference 0x04 frames)
                audio_rate = 48000.0 if bucket == "wfm" else self.audio_rate
                bank = ChannelBank(self.in_rate, BUCKET_CHAIN_MODE[bucket],
                                   capacity=self.capacity,
                                   audio_rate=audio_rate,
                                   compression="none" if service else self.compression,
                                   block=self.block)
                self.banks[key] = bank
            return bank

    def _pfb_channels(self) -> int:
        """PFB channel count for this device rate: the largest power of two
        keeping the channel slice ≥ 24 kHz (so every service passband plus
        fine shift fits, and the chain's audio resampler works from a
        sensible rate).  0 ⇒ device too narrow to channelize."""
        import math
        if self.in_rate < 24000 * 8:
            return 0
        return min(4096, 2 ** int(math.log2(self.in_rate / 24000)))

    def _pfb_m_for(self, bucket: str) -> int:
        """Channel count for a bucket's filterbank: start from
        _pfb_channels() and halve (widening slices) until the bucket's
        demod chain is feasible at the channel rate — NFM's 48 kHz IF
        needs ≥48 kHz slices, WFM's 250 kHz IF ≥250 kHz.  0 ⇒ this bucket
        cannot channelize at this device rate.  Cached per bucket (the
        probe constructs a chain)."""
        cached = self._pfb_m.get(bucket)
        if cached is not None:
            return cached
        from openwebrx_tpu.models.receiver import ClientDemodulatorChain
        audio_rate = 48000.0 if bucket == "wfm" else self.audio_rate
        m = self._pfb_channels()
        while m >= 8:
            try:
                ClientDemodulatorChain(self.in_rate / m, audio_rate,
                                       BUCKET_CHAIN_MODE[bucket], "none")
                break
            except ValueError:
                m //= 2
        else:
            m = 0
        self._pfb_m[bucket] = m
        return m

    def _get_pfb_bank(self, bucket: str, interactive: bool = False):
        """Per-bucket ChannelizedBank: ALL dials of a bucket demodulate
        from ONE polyphase filterbank program at channel rate instead of
        each filtering the full device rate — the scaling replacement for
        the reference's greedy resampler-tree for services
        (owrx/service/__init__.py:199-252) AND for its one-chain-per-client
        listener model (owrx/dsp.py:437-512; SURVEY §2.6).

        Two banks per bucket: 'pfb:' (services, raw audio, ~0.3 s delivery
        batches) and 'pfbi:' (interactive listeners, client compression,
        per-block delivery for interactive latency)."""
        from openwebrx_tpu.runtime.channelized import ChannelizedBank
        key = ("pfbi:" if interactive else "pfb:") + bucket
        with self._lock:
            bank = self.banks.get(key)
            if bank is None:
                m = self._pfb_m_for(bucket)
                if interactive:
                    # per-block delivery; listeners get the client codec
                    stride = 1
                    compression = self.compression
                else:
                    stride = max(1, int(round(self.service_delivery_seconds
                                              / self.target_seconds)))
                    compression = "none"
                bank = ChannelizedBank(
                    self.in_rate, m,
                    mode=BUCKET_CHAIN_MODE[bucket],
                    audio_rate=(48000.0 if bucket == "wfm"
                                else self.audio_rate),
                    compression=compression, block=self.block,
                    capacity=min(m, self.pfb_capacity
                                 or max(64, self.capacity)),
                    delivery_stride=stride)
                if interactive and bank.chunk_ratio > 2:
                    # the channel-rate chain's divisibility needs force the
                    # bank to accumulate >2 device blocks per dispatch —
                    # too much added latency for a listener; remember and
                    # serve this bucket's listeners full-rate
                    self._pfbi_infeasible.add(bucket)
                    return None
                self.banks[key] = bank
            return bank

    def _pfb_route(self, bucket: str, offset_hz: float, lo: float, hi: float,
                   interactive: bool, margin: float = 0.4):
        """Try to place a dial on the bucket's PFB bank.  Returns
        (bucket_key, slot) or None when the filterbank can't serve it:
        device too narrow, passband wider than a channel slice, dial
        straddling a channel edge, channel already occupied, bank full."""
        m = self._pfb_m_for(bucket)
        if m < 8 or (hi - lo) > 2 * margin * self.in_rate / m:
            return None
        if interactive and bucket in self._pfbi_infeasible:
            return None
        # fit check BEFORE constructing/compiling a bank: an edge dial must
        # not pay a filterbank compile just to be turned away
        from openwebrx_tpu.ops.channelizer import channel_frequencies
        k = int(round(offset_hz * m / self.in_rate)) % m
        fine = offset_hz - channel_frequencies(m, self.in_rate)[k]
        half = margin * self.in_rate / m
        if not ((fine + lo) >= -half and (fine + hi) <= half):
            return None
        bank = self._get_pfb_bank(bucket, interactive)
        if bank is None:
            return None
        # gathered banks share channels freely (duplicate gather indices);
        # only dense banks (slot ≡ channel) need the occupancy check
        free = bank.capacity is not None or not bank.channel_in_use(k)
        if not (free and bank.has_free_slot()):
            return None
        slot = bank.assign(offset_hz)
        bank.set_bandpass(slot, lo, hi)
        return ("pfbi:" if interactive else "pfb:") + bucket, slot

    def open_channel(self, mode: str, offset_hz: float = 0.0,
                     service: bool = False) -> ChannelHandle:
        """service=True → raw int16 audio (for choppers/recorders);
        otherwise the client codec (ADPCM).

        Both kinds of channel come from the per-bucket PFB ChannelizedBank
        when the dial's passband fits inside a free PFB channel slice —
        O(P + log M) work per input sample for ALL dials together, so N
        listeners do NOT cost N full-rate filter chains (the reference's
        scaling failure mode, owrx/dsp.py:437-512).  Dials that straddle a
        channel edge (or collide with an occupied channel) fall back to a
        full-rate ChannelBank slot; retuning migrates live in both
        directions (retune_channelized / try_pfb_readmit)."""
        bucket = BANK_BUCKET[mode]
        if bucket not in self.available_buckets:
            raise KeyError(f"mode {mode} not available at "
                           f"{self.in_rate:.0f} S/s")
        lo, hi = MODE_BANDPASS[mode]
        routed = None
        try:
            routed = self._pfb_route(bucket, offset_hz, lo, hi,
                                     interactive=not service)
        except (ValueError, KeyError):
            logger.exception("PFB bank unavailable for %s; "
                             "falling back to full-rate bank", mode)
        if routed is not None:
            key, slot = routed
            handle = ChannelHandle(self, mode, slot)
            handle.bucket_key = key
            with self._lock:
                self.handles.append(handle)
            return handle
        key = f"svc:{bucket}" if service else bucket
        bank = self._get_bank(key)
        slot = bank.add_channel(offset_hz)
        bank.set_bandpass(slot, lo, hi)
        handle = ChannelHandle(self, mode, slot)
        handle.bucket_key = key
        with self._lock:
            self.handles.append(handle)
        return handle

    def retune_channelized(self, handle: ChannelHandle, offset_hz: float):
        """Retune a PFB-backed handle, re-running the fit check: stays in
        the filterbank when the new dial fits a free (or its own) channel,
        otherwise migrates live to a full-rate slot — a straddling
        passband would get transition-band-attenuated garbage from the
        critically-sampled PFB.  Interactive handles migrate to their
        bucket's listener bank, services to 'svc:'."""
        with self._lock:
            interactive = handle.bucket_key.startswith("pfbi:")
            bank = self.banks[handle.bucket_key]
            lo, hi = float(bank._low[handle.slot]), float(bank._high[handle.slot])
            k, _ = bank.channel_for(offset_hz)
            own = (bank.capacity is not None
                   or int(bank._chan[handle.slot]) == k)
            if bank.fits(offset_hz, lo, hi) and (own or
                                                 not bank.channel_in_use(k)):
                handle.slot = bank.retune(handle.slot, offset_hz)
                return
            # migrate to the full-rate bank, keeping controls
            sq = float(bank._squelch[handle.slot])
            nr = float(bank._nr[handle.slot])
            bank.remove_channel(handle.slot)
            handle.slot = None            # handle is inert if reopen fails
            bucket = handle.bucket_key.split(":", 1)[-1]
            new_key = bucket if interactive else f"svc:{bucket}"
            new_bank = self._get_bank(new_key)
            slot = new_bank.add_channel(offset_hz, squelch_db=sq)
            new_bank.set_bandpass(slot, lo, hi)
            new_bank.set_nr(slot, nr)
            handle.slot = slot
            handle.bucket_key = new_key
            # the new slot's codec state starts fresh — resync the framer
            handle.framer = SyncFramer()

    # kept under the old name for external callers
    retune_service = retune_channelized

    def try_pfb_readmit(self, handle: ChannelHandle,
                        offset_hz: float) -> bool:
        """A full-rate handle retuning to a dial that fits the filterbank
        moves back in.  The stricter 0.35 margin (vs the 0.4 fit) is
        hysteresis: a drag oscillating across a channel edge must not
        thrash between banks."""
        with self._lock:
            old_key = handle.bucket_key
            if handle.slot is None or old_key.startswith(("pfb:", "pfbi:")):
                return False
            interactive = not old_key.startswith("svc:")
            bucket = old_key.split(":", 1)[-1]
            bank = self.banks[old_key]
            lo = float(bank._low[handle.slot])
            hi = float(bank._high[handle.slot])
            try:
                routed = self._pfb_route(bucket, offset_hz, lo, hi,
                                         interactive, margin=0.35)
            except (ValueError, KeyError):
                return False
            if routed is None:
                return False
            sq = float(bank._squelch[handle.slot])
            nr = float(bank._nr[handle.slot])
            bank.remove_channel(handle.slot)
            key, slot = routed
            new_bank = self.banks[key]
            new_bank.set_squelch(slot, sq)
            new_bank.set_nr(slot, nr)
            handle.slot = slot
            handle.bucket_key = key
            handle.framer = SyncFramer()
            return True

    def open_secondary(self, mode: str, offset_hz: float) -> SecondaryHandle:
        """Attach a digimode listener: same-mode listeners share one
        batched SecondaryBank program (N cursors ≠ N programs)."""
        with self._lock:
            bank = self.secondary_banks.get(mode)
            if bank is None:
                bank = SecondaryBank(self, mode)
                self.secondary_banks[mode] = bank
                self.secondary_handles.append(bank)   # device feed path
            handle = SecondaryHandle(self, mode, offset_hz, bank)
        return handle

    def _drop_secondary_bank(self, bank: SecondaryBank):
        with self._lock:
            if self.secondary_banks.get(bank.secondary_mode) is bank:
                del self.secondary_banks[bank.secondary_mode]
            if bank in self.secondary_handles:
                self.secondary_handles.remove(bank)

    def open_iq_channel(self, if_rate: float, offset_hz: float,
                        wire_format: str = "cs16") -> IqServiceHandle:
        handle = IqServiceHandle(self, if_rate, offset_hz, wire_format)
        with self._lock:
            self.secondary_handles.append(handle)  # same feed path
        return handle

    def release_secondary(self, handle):
        with self._lock:
            bank = getattr(handle, "bank", None)
            if isinstance(bank, SecondaryBank):
                bank.detach(handle)
                handle.slot = None
                return
            if handle in self.secondary_handles:
                self.secondary_handles.remove(handle)

    def release_channel(self, handle: ChannelHandle):
        with self._lock:
            if handle in self.handles:
                self.handles.remove(handle)
                if handle.slot is not None:
                    self.banks[handle.bucket_key].remove_channel(handle.slot)

    def switch_mode(self, handle: ChannelHandle, mode: str,
                    offset_hz: float | None = None):
        is_pfb = handle.bucket_key.startswith(("pfb:", "pfbi:"))
        service = handle.bucket_key.startswith(("svc:", "pfb:"))
        new_bucket = BANK_BUCKET[mode]
        new_key = f"svc:{new_bucket}" if service else new_bucket
        if new_bucket not in self.available_buckets:
            raise KeyError(f"mode {mode} not available at "
                           f"{self.in_rate:.0f} S/s")
        with self._lock:
            bank = self.banks[handle.bucket_key]
            if offset_hz is not None:
                offset = offset_hz
            elif is_pfb:
                # dial = the slot's channel center + fine offset
                from openwebrx_tpu.ops.channelizer import channel_frequencies
                k = int(bank._chan[handle.slot])
                offset = float(channel_frequencies(bank.m, bank.in_rate)[k]
                               + bank._fine[handle.slot])
            else:
                offset = float(bank._offsets[handle.slot])
            if new_key == handle.bucket_key and not is_pfb:
                handle.mode = mode
                lo, hi = MODE_BANDPASS[mode]
                bank.set_bandpass(handle.slot, lo, hi)
                return
            bank.remove_channel(handle.slot)
            # re-run the full open_channel routing (PFB fit + fallback) for
            # the new mode; if the reopen fails the handle goes inert
            # (slot None) instead of aliasing a freed slot some new
            # listener may take over
            self.handles.remove(handle)
            handle.slot = None
            new_handle = self.open_channel(mode, offset, service=service)
            handle.slot = new_handle.slot
            handle.mode = mode
            handle.bucket_key = new_handle.bucket_key
            self.handles.remove(new_handle)
            self.handles.append(handle)
            handle.framer = SyncFramer()

    # -- waterfall --------------------------------------------------------
    def subscribe_waterfall(self, cb):
        with self._lock:
            self.waterfall_subscribers.append(cb)

    def unsubscribe_waterfall(self, cb):
        with self._lock:
            if cb in self.waterfall_subscribers:
                self.waterfall_subscribers.remove(cb)

    # -- loop -------------------------------------------------------------
    def start(self):
        with self._lock:
            if self._running:
                return
            self._running = True
            # keep the device→host stream hot while streaming: sporadic
            # result fetches on tunnel transports pay a 0.2-3 s channel
            # cold-start otherwise (runtime/keepalive.py)
            from openwebrx_tpu.runtime.keepalive import TransportKeepalive
            TransportKeepalive.shared().acquire()
            self.source.start()
            self._thread = threading.Thread(target=self._loop,
                                            name=f"device-{self.source.id}",
                                            daemon=True)
            self._thread.start()

    def stop(self):
        if not self._running:
            return
        self._running = False
        from openwebrx_tpu.runtime.keepalive import TransportKeepalive
        TransportKeepalive.shared().release()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _loop(self):
        # throughput observability (SURVEY §5.1: per-kernel samples/s —
        # exposed at /metrics as device.<id>.* Prometheus gauges)
        import time as _time
        from openwebrx_tpu.core.metrics import Metrics
        m = Metrics.shared()
        prefix = f"device.{self.source.id}"
        m_blocks = m.counter(f"{prefix}.blocks")
        m_rate = m.direct(f"{prefix}.samples_per_s")
        m_proc = m.direct(f"{prefix}.proc_block_ms")
        m_rt = m.direct(f"{prefix}.realtime_factor")
        rate = float(self.source.get_sample_rate() or 0)
        ema_ms = None
        # depth-N software pipeline: dispatch block N to the device, then
        # deliver the oldest in-flight block's (already transferred)
        # results.  Over a tunnel-attached TPU the device→host copies of a
        # block take ~25-50 ms to land after issue; each extra pipeline
        # slot shadows them with a full block of real-time arrival, so the
        # per-block cost the loop pays is dispatch (~ms), not the transfer
        # round trip.
        from collections import deque
        pending = deque()

        def drain_all():
            while pending:
                try:
                    self._complete_block(pending.popleft())
                except Exception:
                    logger.exception("device %s block completion failed",
                                     self.source.id)

        while self._running:
            # short timeout while blocks are in flight: a paused/slow
            # stream must not hold completed results for the full idle
            # timeout (their copies land within ~50 ms of dispatch)
            block = self.source.read_block(timeout=0.06 if pending else 1.0)
            if block is None:
                drain_all()
                continue
            t0 = _time.perf_counter()
            try:
                pending.append(self._dispatch_block(block))
                if len(pending) >= self.pipeline_depth:
                    self._complete_block(pending.popleft())
            except Exception:
                logger.exception("device %s block processing failed", self.source.id)
                pending.clear()
                continue
            dt = _time.perf_counter() - t0
            ema_ms = dt * 1e3 if ema_ms is None else ema_ms * 0.9 + dt * 1e3 * 0.1
            m_blocks.inc()
            m_proc.set(round(ema_ms, 3))
            if ema_ms > 0:
                # smoothed so a single idle (no-subscriber) block doesn't
                # report a fantasy realtime factor
                m_rate.set(round(len(block) / (ema_ms / 1e3)))
                if rate:
                    m_rt.set(round(len(block) / (ema_ms / 1e3) / rate, 2))
        drain_all()

    def _process_block(self, block: np.ndarray):
        """Synchronous dispatch+complete (kept for tests/direct callers;
        the streaming loop pipelines the two phases one block deep)."""
        self._complete_block(self._dispatch_block(block))

    def _dispatch_block(self, block: np.ndarray) -> dict:
        import jax
        from openwebrx_tpu.runtime.chain import (
            host_as_complex64, host_pack_complex,
        )

        with self._lock:
            banks = {k: b for k, b in self.banks.items() if b.n_active}
            handles = list(self.handles)
            secondaries = list(self.secondary_handles)

        # ONE host→device transfer of the IQ block, shared by the waterfall
        # program and every bank (the tunnel transfer dominates per-program
        # compute at interactive rates).  int16-packed source blocks go up
        # as-is — HALF the wire bytes — and become float on the device.
        want_fft = bool(self.waterfall_subscribers)
        if want_fft or banks:
            if getattr(block, "dtype", None) in (np.int16, np.uint8) \
                    and block.ndim == 2:
                # int16/uint8 wire samples go up as-is (half / quarter the
                # bytes) and become float on the device (_unpack_leaf)
                xdev = jax.device_put(np.ascontiguousarray(block))
            else:
                xdev = jax.device_put(
                    host_pack_complex(np.ascontiguousarray(block)))
        # dispatch everything BEFORE fetching anything: JAX async dispatch
        # overlaps the programs' device work and result transfers
        fft_pending = (self.fft_program.dispatch(xdev, to_host=False)
                       if want_fft else None)
        # snapshot each bank's fetcher alongside its pending outputs: a
        # mode-switch rebuild between dispatch and complete must not make
        # complete() unpack with the NEW program's masks.  feed_dispatch
        # returns None while a long-chain bank (WFM) is still accumulating
        # device chunks toward its own larger block.  ChannelizedBank
        # ('pfb:' buckets) is its own fetcher; ChannelBank's is its Program.
        bank_pending = {bucket: (getattr(bank, "program", bank),
                                 bank.feed_dispatch(xdev, to_host=False))
                        for bucket, bank in banks.items()}
        # CROSS-PROGRAM JOIN (round 5): every program's fused int32 output
        # buffer for this block concatenates ON DEVICE into one transfer —
        # a device with waterfall + N mode banks pays ONE serialized
        # device→host round trip per block instead of N+1 (each round trip
        # is a ~30 ms floor on tunnel transports; measured ~2× on the
        # waterfall+listener leg).  The eager concat executable is
        # shape-cached by XLA across blocks.
        segs = []                 # ("fft" | bucket, stride_n | None, words)
        bufs = []
        if fft_pending is not None:
            segs.append(("fft", None, int(fft_pending[0].shape[0])))
            bufs.append(fft_pending[0])
        for bucket, (program, pend) in bank_pending.items():
            if pend is None:
                continue
            n = pend[1] if isinstance(pend[1], int) else None
            segs.append((bucket, n, int(pend[0].shape[0])))
            bufs.append(pend[0])
        joined = None
        if len(bufs) == 1:
            target = bufs[0]
        elif bufs:
            import jax.numpy as jnp
            joined = jnp.concatenate(bufs)
            target = joined
        else:
            target = None
        if target is not None:
            try:
                target.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        # secondaries fetch internally; they run while the banks are in
        # flight (and only on their own block cadence)
        if secondaries:
            cblock = host_as_complex64(block)
            for sec in secondaries:
                try:
                    sec.feed(cblock)
                except Exception:
                    logger.exception("secondary %s failed", sec.mode)
        return {"banks": banks, "handles": handles,
                "fft_pending": fft_pending, "bank_pending": bank_pending,
                "joined": joined, "segs": segs}

    def _complete_block(self, pending: dict):
        banks = pending["banks"]
        handles = pending["handles"]
        fft_pending = pending["fft_pending"]
        bank_pending = pending["bank_pending"]

        # one fetch of the cross-program joined buffer, then host views
        # per program (their fetch()/fetch_many() accept np arrays as-is)
        seg_np: dict = {}
        if pending.get("joined") is not None:
            buf = np.asarray(pending["joined"])
            from openwebrx_tpu.runtime.keepalive import TransportKeepalive
            TransportKeepalive.note_fetch()
            off = 0
            for key, _n, words in pending["segs"]:
                seg_np[key] = buf[off:off + words]
                off += words

        # waterfall (shared per device, reference owrx/fft.py); rows are
        # compressed ONCE for all subscribers (reference: FftAdpcm inside
        # the shared FftChain)
        if fft_pending is not None:
            rows, _ = self.fft_program.fetch(
                seg_np.get("fft", fft_pending[0]))
            rows_np = np.atleast_2d(np.asarray(rows))
            if self.fft_compression == "adpcm":
                # rows arrive ADPCM-compressed from the device program
                # (WaterfallStage compress=True): int32 words → wire bytes
                nb = self.fft_chain.waterfall.wire_bytes_per_row
                raw = rows_np.view(np.uint8).reshape(rows_np.shape[0], -1)
                payloads = [raw[i, :nb].tobytes()
                            for i in range(raw.shape[0])]
            else:
                payloads = [row.astype(np.float32).tobytes() for row in rows_np]
            for cb in list(self.waterfall_subscribers):
                for payload in payloads:
                    cb(payload)
        outputs = {}
        for bucket, bank in banks.items():
            program, pend = bank_pending[bucket]
            if pend is None:      # accumulating bank: no results this block
                continue
            src = seg_np.get(bucket, pend[0])
            if isinstance(pend[1], int):
                # delivery-stride batch (ChannelizedBank.feed_dispatch):
                # one transfer carrying several bank blocks, in order
                results = program.fetch_many(src, pend[1])
            else:
                results = [program.fetch(src)]
            decoded = []
            for y, aux in results:
                # ONE device→host transfer per bank (whole arrays), then
                # numpy slicing per handle — per-slot eager jax indexing
                # from this thread can wedge against the in-flight donated
                # computation
                y_np = tuple(np.asarray(a) for a in y) \
                    if isinstance(y, tuple) else np.asarray(y)
                power_np = None
                rds_np = None
                for key in aux:
                    if key.endswith("power_db") and power_np is None:
                        power_np = np.asarray(aux[key])
                    elif key.endswith(".rds"):
                        rds_np = np.asarray(aux[key])
                decoded.append((y_np, power_np, rds_np))
            outputs[bucket] = decoded
        for handle in handles:
            outs = outputs.get(handle.bucket_key)
            if not outs or handle.slot is None:
                continue
            for y_np, power_np, rds_np in outs:
                if handle.audio_cb is not None:
                    bank_comp = banks[handle.bucket_key].compression
                    if bank_comp == "adpcm":
                        bytes_, stride_states = y_np
                        wire = handle.framer.frame(bytes_[handle.slot],
                                                   stride_states[handle.slot])
                    else:
                        wire = y_np[handle.slot].tobytes()
                    handle.audio_cb(wire, handle.bucket_key.endswith("wfm"))
                if handle.smeter_cb is not None and power_np is not None:
                    # 4 reports/s from 16 measurements/s (reference
                    # csdr/chain/selector.py:104-105)
                    self._emit_smeter(handle, power_np[handle.slot])
                if handle.rds_cb is not None and rds_np is not None:
                    handle.feed_rds(rds_np[handle.slot])

    def _emit_smeter(self, handle, power: np.ndarray):
        for i, v in enumerate(power):
            handle._smeter_decim += 1
            if handle._smeter_decim % 4 == 0:
                handle.smeter_cb(float(v))
