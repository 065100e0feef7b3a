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


def _configure_compilation_cache():
    """Persist XLA compilations across server restarts.

    The bank/waterfall programs take tens of seconds to compile on a TPU;
    the reference's csdr chains start instantly, so first-audio latency
    after a restart is a real UX regression without this.  Opt out with
    OPENWEBRX_JAX_CACHE=0; relocate with OPENWEBRX_JAX_CACHE=<dir>.
    """
    import os

    cache = os.environ.get("OPENWEBRX_JAX_CACHE", "")
    if cache == "0":
        return
    if not cache:
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "openwebrx_tpu", "jax")
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass


_configure_compilation_cache()
