"""DSP kernel library: pure functional block-processing ops for TPU.

Every op here is shaped ``(state, params, x) -> (state, y)`` or a pure
function, operates on the LAST axis (time) and broadcasts over arbitrary
leading batch axes (channels), so a bank of listener channels is one tensor
program.  Sequential semantics (IIR, AGC, timing recovery) are expressed as
associative scans or short ``lax.scan`` loops vectorized over channels —
never per-sample Python.

Reference parity targets (see SURVEY.md §2.3-A): each class of
``pycsdr.modules`` maps to an op here; citations in each module docstring.
"""

from openwebrx_tpu.ops.formats import Format, StreamSpec

__all__ = ["Format", "StreamSpec"]
