"""Chain models: the reference's demodulator-chain vocabulary, declaratively.

``stages`` wraps each op in ``openwebrx_tpu.ops`` as a composable Stage;
``selector`` / ``analog`` / ``fft`` / ``clientaudio`` build the chains the
reference wires in ``csdr/chain/{selector,analog,fft,clientaudio}.py`` and
``owrx/dsp.py``.
"""
