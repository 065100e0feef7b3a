"""Full receiver chains: per-client demodulator and per-device waterfall.

Reference: ``ClientDemodulatorChain`` (``owrx/dsp.py:39-425``) = Selector →
demodulator → ClientAudioChain, with live mode switching via Chain.replace;
``FftChain`` (``csdr/chain/fft.py:75-96``) for the device waterfall.
"""

from __future__ import annotations

from openwebrx_tpu.models.analog import Am, NFm, WFm, Ssb, SAm, RawAm, BaseDemodulatorChain
from openwebrx_tpu.models.clientaudio import ClientAudioChain
from openwebrx_tpu.models.selector import Selector
from openwebrx_tpu.models.stages import WaterfallStage, plan_block_size
from openwebrx_tpu.ops.formats import Format, StreamSpec
from openwebrx_tpu.runtime.chain import Chain, Program

# demodulator factory by mode string (reference owrx/dsp.py:595-652)
DEMOD_FACTORY = {
    "nfm": lambda: NFm(),
    "wfm": lambda: WFm(audio_rate=48000),
    "am": lambda: Am(),
    "sam": lambda: SAm(),
    "lsb": lambda: Ssb(),
    "usb": lambda: Ssb(),
    "cw": lambda: Ssb(),
    "rawam": lambda: RawAm(),
    "rawsam": lambda: SAm(),
    "usbd": lambda: Ssb(),
}

# default passbands per mode (reference owrx/modes.py bandpasses)
MODE_BANDPASS = {
    "nfm": (-4000, 4000),
    "wfm": (-75000, 75000),
    "am": (-4000, 4000),
    "sam": (-4000, 4000),
    "lsb": (-3000, -300),
    "usb": (300, 3000),
    "cw": (400, 900),
    "rawam": (-10000, 10000),
    "rawsam": (-10000, 10000),
    "usbd": (300, 12000),
}


class ClientDemodulatorChain(Chain):
    """Selector → demodulator → client audio, one jit program.

    The chain rebuilds (re-plan + cached re-jit) only on mode/rate changes,
    exactly when the reference does live graph surgery
    (owrx/dsp.py:654-680); tuning/squelch/passband are traced params.
    """

    def __init__(self, in_rate: float, audio_rate: float = 12000.0,
                 mode: str = "nfm", compression: str = "adpcm",
                 name: str = "client_demod"):
        self.in_rate = float(in_rate)
        self.audio_rate = float(audio_rate)
        self.mode = mode
        self.compression = compression
        demod = DEMOD_FACTORY[mode]()
        if_rate = demod.get_if_rate(audio_rate)
        self.selector = Selector(in_rate, if_rate)
        self.selector.set_bandpass(*MODE_BANDPASS[mode])
        self.demod = demod
        audio_in = demod.fixed_audio_rate or if_rate
        self.audio = ClientAudioChain(audio_in, audio_rate, compression)
        super().__init__([self.selector, self.demod, self.audio], name=name)

    # -- live controls (reference DspManager property wires, owrx/dsp.py:538-562)
    def set_frequency_offset(self, offset_hz: float):
        self.selector.set_frequency_offset(offset_hz)

    def set_bandpass(self, low_hz: float, high_hz: float):
        self.selector.set_bandpass(low_hz, high_hz)

    def set_squelch_level(self, level_db: float):
        self.selector.set_squelch_level(level_db)

    def set_mode(self, mode: str):
        """Mode switch = rebuild demod + audio legs (reference
        DspManager.setDemodulator, owrx/dsp.py:654-680)."""
        if mode == self.mode:
            return
        self.__init__(self.in_rate, self.audio_rate, mode, self.compression,
                      name=self.name)


class FftChain(Chain):
    """Device waterfall (reference csdr/chain/fft.py + owrx/fft.py)."""

    def __init__(self, fft_size: int = 4096, fps: float = 9.0,
                 add_db: float = -70.0, name: str = "fft",
                 compress: bool = False):
        self.waterfall = WaterfallStage(fft_size, fps, add_db,
                                        compress=compress)
        super().__init__([self.waterfall], name=name)


def build_program(chain: Chain, in_rate: float, batch_shape=(),
                  target_seconds: float = 0.1) -> Program:
    """Plan a block size and compile the chain into a streaming Program."""
    spec = StreamSpec(Format.COMPLEX_FLOAT, in_rate)
    block = plan_block_size(chain, spec, target_seconds)
    return Program(chain, spec, block, batch_shape)
