"""openwebrx_tpu — a TPU-native multi-user web SDR framework.

A from-scratch rebuild of the capabilities of OpenWebRX+ (reference:
tildearrow/openwebrx) designed TPU-first:

- The DSP backend (channel selection, demodulation, waterfall FFT — see
  reference ``csdr/chain/``, ``owrx/dsp.py``, ``owrx/fft.py``) is a library of
  batched, functional block-processing kernels (``openwebrx_tpu.ops``)
  compiled by XLA, with streaming state carried explicitly as pytrees.
  Many listener channels are demodulated as one batched tensor program
  instead of the reference's thread-per-module pull graph.
- Chains (``openwebrx_tpu.models``) are declarative descriptions with the
  same vocabulary as the reference (Selector, NFm, ClientAudioChain, ...)
  including live reconfiguration semantics, compiled to jitted block steps.
- Multi-chip scaling (``openwebrx_tpu.parallel``) shards listener channels
  and frequency slabs over a ``jax.sharding.Mesh`` with XLA collectives,
  replacing the reference's thread/process/TCP fabric.
- The control plane (``openwebrx_tpu.web``, ``openwebrx_tpu.core``) is
  host-side Python: property system, config, WebSocket protocol, sources,
  services — mirroring the reference's public behavior.
"""

__version__ = "0.1.0"
