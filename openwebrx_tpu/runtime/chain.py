"""Stage/Chain/Program: the functional chain graph and its compiler.

Design (SURVEY.md §7): a chain is a *description*; compiling it against an
input StreamSpec + block size yields a single jitted step function whose
carried state is a pytree of per-stage states.  All stages operate on the
last (time) axis and broadcast over leading channel axes, so one Program
can serve a whole bank of listener channels (the TPU replacement for the
reference's per-client thread graphs, reference ``owrx/dsp.py:502-512``).

Stage lifecycle:
  plan(in_spec, block)  → (out_spec, out_block)   static planning, host-side
  init_state(batch)     → pytree                  fresh streaming state
  params()              → pytree                  current dynamic params
  apply(state, params, x) → (state, y, aux)       pure, traced

``signature()`` must capture ALL static configuration (tap digests
included) — it keys the jit cache, so two structurally identical chains
share one compiled program.

Params are *versioned*: every live setter bumps its stage's version, and a
Program re-materializes (and re-uploads) the param pytree only when the
chain's aggregate version changed.  Without this, every block dispatch
would rebuild every traced param — a handful of host→device RPCs per block
that dominates the step time over a tunnel-attached TPU (measured 10× on
BASELINE config #5).
"""

from __future__ import annotations

import abc
import hashlib
import logging
from math import gcd

import numpy as np
import jax
import jax.numpy as jnp

from openwebrx_tpu.ops.formats import StreamSpec

logger = logging.getLogger(__name__)


def digest(arr) -> str:
    """Short content hash of a numpy array for signatures."""
    a = np.ascontiguousarray(arr)
    return hashlib.sha1(a.tobytes() + str(a.shape).encode()).hexdigest()[:12]


class Stage(abc.ABC):
    """A pure block-processing stage."""

    name: str = ""
    _pver: int = 0      # params version — bumped by live setters

    @abc.abstractmethod
    def plan(self, in_spec: StreamSpec, block: int) -> tuple[StreamSpec, int]:
        """Compute static config; return (out_spec, out_block)."""

    def init_state(self, batch_shape=()):
        return ()

    def params(self):
        return ()

    def _bump(self):
        """Mark params dirty (call from every live setter)."""
        self._pver += 1

    def params_version(self) -> int:
        return self._pver

    @abc.abstractmethod
    def apply(self, state, params, x):
        """Returns (new_state, y, aux_dict)."""

    @abc.abstractmethod
    def signature(self) -> tuple:
        """Hashable static identity (post-plan)."""

    @property
    def label(self) -> str:
        return self.name or type(self).__name__


class Chain(Stage):
    """Sequential composite of stages — same vocabulary as the reference
    Chain (csdr/chain/__init__.py:11-162) but functional."""

    def __init__(self, workers: list[Stage], name: str = ""):
        self.workers = list(workers)
        self.name = name
        self._planned = False

    # -- graph surgery (reference csdr/chain/__init__.py:53-135) ----------
    def replace(self, index: int, stage: Stage):
        self.workers[index] = stage
        self._planned = False
        self._bump()

    def insert(self, index: int, stage: Stage):
        self.workers.insert(index, stage)
        self._planned = False
        self._bump()

    def remove(self, index: int):
        del self.workers[index]
        self._planned = False
        self._bump()

    def append(self, stage: Stage):
        self.workers.append(stage)
        self._planned = False
        self._bump()

    def index_of(self, pred) -> int:
        for i, w in enumerate(self.workers):
            if pred(w):
                return i
        return -1

    # -- Stage interface --------------------------------------------------
    def plan(self, in_spec: StreamSpec, block: int):
        spec, blk = in_spec, block
        for w in self.workers:
            spec, blk = w.plan(spec, blk)
        self._planned = True
        return spec, blk

    def init_state(self, batch_shape=()):
        return tuple(w.init_state(batch_shape) for w in self.workers)

    def params(self):
        return tuple(w.params() for w in self.workers)

    def params_version(self) -> int:
        return self._pver + sum(w.params_version() for w in self.workers)

    def apply(self, state, params, x):
        new_state = []
        aux = {}
        for i, w in enumerate(self.workers):
            s, x, a = w.apply(state[i], params[i], x)
            new_state.append(s)
            for k, v in a.items():
                aux[f"{w.label}.{k}"] = v
        return tuple(new_state), x, aux

    def signature(self):
        return ("chain",) + tuple(w.signature() for w in self.workers)


class Fanout(Stage):
    """Parallel branches over the same input block, fused into ONE program.

    The TPU-first answer to "several chains consume the same device IQ":
    instead of one jitted program per chain (each paying a dispatch and a
    serialized device→host result round trip per block — the dominant cost
    on tunnel transports, and extra launch overhead everywhere), all
    branches trace into a single XLA program whose outputs fuse into the
    Program's single result buffer.  Replaces the reference's thread-per-
    chain fan-out from a shared ring buffer (owrx/source/__init__.py
    buffer fan-out + owrx/dsp.py per-client chains).

    Branch outputs come back keyed: y = {name: y_branch},
    aux = {"name.key": value}.  Branches may carry different batch shapes
    (e.g. a () waterfall next to a (16,) channel bank) via batch_shapes.
    """

    def __init__(self, branches: list[tuple[str, Stage]],
                 batch_shapes: dict[str, tuple] | None = None,
                 name: str = "fanout"):
        self.branches = list(branches)
        self.batch_shapes = dict(batch_shapes or {})
        self.name = name

    def plan(self, in_spec: StreamSpec, block: int):
        for _, b in self.branches:
            b.plan(in_spec, block)
        return in_spec, block

    def init_state(self, batch_shape=()):
        return tuple(b.init_state(self.batch_shapes.get(k, batch_shape))
                     for k, b in self.branches)

    def params(self):
        return tuple(b.params() for _, b in self.branches)

    def params_version(self) -> int:
        return self._pver + sum(b.params_version() for _, b in self.branches)

    def apply(self, state, params, x):
        new_state = []
        ys = {}
        aux = {}
        for i, (k, b) in enumerate(self.branches):
            s, y, a = b.apply(state[i], params[i], x)
            new_state.append(s)
            ys[k] = y
            for kk, vv in a.items():
                aux[f"{k}.{kk}"] = vv
        return tuple(new_state), ys, aux

    def signature(self):
        return ("fanout",) + tuple(
            (k, b.signature(), self.batch_shapes.get(k))
            for k, b in self.branches)


# program-level jit cache: structural signature → compiled step
_PROGRAM_CACHE: dict[tuple, callable] = {}


# --------------------------------------------------- boundary codecs -----
# Two classes of array cannot cross the jit boundary efficiently (or at
# all) on tunnel-attached TPU backends (the axon tunnel in particular):
#
#  * complex64 buffers fail outright with UNIMPLEMENTED — complex compute
#    INSIDE a program is fine, but complex jit inputs/outputs/carried
#    state cannot exist as device buffers.  Complex leaves are packed as
#    (..., 2) float32 (re, im) at the boundary and rebuilt with
#    lax.complex inside.
#
#  * sub-word dtypes (uint8/int8/int16/uint16) transfer device→host
#    through a pathological path: the first fetch of a large sub-word
#    array takes SECONDS TO MINUTES (measured 75–155 s for ~300 kB) while
#    the same bytes as int32 move in milliseconds.  Output leaves of these
#    dtypes are therefore bitcast to int32 lanes inside the program (last
#    axis padded to a lane multiple) and viewed back to the original
#    dtype/shape on the host — an exact, zero-copy reinterpretation.
#
# Leaf codecs are described per output tree position:
#   None                     pass through
#   "c"                      complex64 ↔ (..., 2) float32
#   ("w", dtype_str, n)      sub-word ↔ int32 lanes; n = original last dim

_SUBWORD = {"uint8": 4, "int8": 4, "int16": 2, "uint16": 2}


def _leaf_codec(aval):
    """Boundary codec descriptor for one output leaf aval."""
    if jnp.issubdtype(aval.dtype, jnp.complexfloating):
        return "c"
    name = np.dtype(aval.dtype).name
    if name in _SUBWORD:
        n = aval.shape[-1] if aval.ndim else 1
        return ("w", name, int(n))
    return None


def _pack_leaf(v):
    """Inside jit: complex leaf → (..., 2) float32 (state/output packing)."""
    if jnp.iscomplexobj(v):
        return jnp.stack([jnp.real(v), jnp.imag(v)], axis=-1)
    return v


def _unpack_leaf(v, was_complex: bool):
    """Inside jit: packed (..., 2) float32 (or int16 / uint8 wire samples,
    what SDR connectors deliver — converted to ±1.0 float HERE so the
    host→device transfer stays at 4 (or 2) bytes/sample) → complex64.
    uint8 uses the rtl-sdr convention (127.4 bias, ±128 full scale)."""
    if was_complex:
        if v.dtype == jnp.int16:
            v = v.astype(jnp.float32) * (1.0 / 32768.0)
        elif v.dtype == jnp.uint8:
            v = (v.astype(jnp.float32) - 127.4) * (1.0 / 128.0)
        return jax.lax.complex(v[..., 0], v[..., 1])
    return v


def _encode_out_leaf(v, codec):
    """Inside jit: encode one OUTPUT leaf for the boundary."""
    if codec == "c":
        return _pack_leaf(v)
    if isinstance(codec, tuple) and codec[0] == "w":
        lane = _SUBWORD[codec[1]]
        x = jnp.atleast_1d(v)
        n = x.shape[-1]
        pad = (-n) % lane
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        x = x.reshape(x.shape[:-1] + (x.shape[-1] // lane, lane))
        return jax.lax.bitcast_convert_type(x, jnp.int32)
    return v


def _decode_out_leaf(v, codec):
    """Host side: decode one fetched OUTPUT leaf (np arrays in/out)."""
    if codec == "c":
        return host_unpack_complex(v)
    if isinstance(codec, tuple) and codec[0] == "w":
        _, name, n = codec
        a = np.ascontiguousarray(np.asarray(v))
        return a.view(np.dtype(name))[..., :n]
    return v


def _is_complex_aval(a) -> bool:
    return jnp.issubdtype(a.dtype, jnp.complexfloating)


def host_pack_complex(x: np.ndarray) -> np.ndarray:
    """Host side: np complex64 → zero-copy (..., 2) float32 view."""
    x = np.ascontiguousarray(x, dtype=np.complex64)
    return x.view(np.float32).reshape(x.shape + (2,))


def host_as_complex64(block: np.ndarray) -> np.ndarray:
    """Host side: any source block form → complex64 samples.  Accepts
    complex64 (legacy sources), packed (n, 2) float32, or packed (n, 2)
    int16 wire samples (±32767 ↔ ±1.0)."""
    if np.iscomplexobj(block):
        return np.ascontiguousarray(block, np.complex64)
    if block.dtype == np.int16:
        f = block.astype(np.float32) * (1.0 / 32768.0)
        return f.view(np.complex64)[..., 0]
    if block.dtype == np.uint8:
        f = (block.astype(np.float32) - 127.4) * (1.0 / 128.0)
        return np.ascontiguousarray(f).view(np.complex64)[..., 0]
    return np.ascontiguousarray(block, np.float32).view(np.complex64)[..., 0]


def host_unpack_complex(v) -> np.ndarray:
    """Host side: fetched (..., 2) float32 → np complex64 (zero copy)."""
    a = np.ascontiguousarray(np.asarray(v, dtype=np.float32))
    return a.view(np.complex64)[..., 0]


def fuse_plan(y_aval, aux_aval, y_codec, aux_codec):
    """Plan the single-buffer output fusion for a program.

    Tunnel-attached TPUs serialize one RPC round trip (~25 ms measured)
    per device→host array, so a program returning audio bytes + codec
    strides + squelch powers pays 3 round trips per block — more than the
    compute.  Fusing every output leaf into ONE int32 buffer inside the
    program makes each block exactly one D2H transfer; on directly
    attached hardware the cost is one concatenate kernel + host views.

    Returns (treedef, plan, total_words) where plan entries are
    (offset_words, n_words, encoded_shape, encoded_dtype)."""
    enc_y = jax.eval_shape(
        lambda t: jax.tree.map(_encode_out_leaf, t, y_codec), y_aval)
    enc_aux = jax.eval_shape(
        lambda t: jax.tree.map(_encode_out_leaf, t, aux_codec), aux_aval)
    leaves, treedef = jax.tree.flatten((enc_y, enc_aux))
    plan = []
    off = 0
    for a in leaves:
        # only dtypes that round-trip through the int32 fused buffer are
        # allowed: int32 (as-is), float32 (bitcast), bool (0/1 cast).
        # Anything else (float64, int64, uint32…) would be silently
        # value-truncated by fuse_leaves' astype — fail at plan time.
        if np.dtype(a.dtype) not in (np.dtype(np.int32), np.dtype(np.float32),
                                     np.dtype(bool)):
            raise TypeError(
                f"fuse_plan: output leaf dtype {a.dtype} cannot round-trip "
                f"through the int32 fused buffer (shape {tuple(a.shape)}); "
                f"encode it to int32/float32/bool in the leaf codec")
        words = int(np.prod(a.shape)) if a.ndim else 1
        plan.append((off, words, tuple(a.shape), np.dtype(a.dtype)))
        off += words
    return treedef, plan, off


def fuse_leaves(leaves):
    """Inside jit: encoded output leaves → one flat int32 buffer."""
    flat = []
    for v in leaves:
        v = jnp.atleast_1d(v)
        if v.dtype == jnp.int32:
            pass
        elif v.dtype == jnp.float32:
            v = jax.lax.bitcast_convert_type(v, jnp.int32)
        else:
            v = v.astype(jnp.int32)
        flat.append(v.reshape(-1))
    if not flat:
        return jnp.zeros((1,), jnp.int32)
    return jnp.concatenate(flat) if len(flat) > 1 else flat[0]


def unfuse_buffer(buf: np.ndarray, treedef, plan):
    """Host side: fetched flat int32 buffer → (y_enc, aux_enc) np trees
    (zero-copy views per leaf)."""
    leaves = []
    for off, words, shape, dt in plan:
        seg = buf[off:off + words]
        if dt == np.float32:
            seg = seg.view(np.float32)
        elif dt != np.int32:
            seg = seg.astype(dt)
        leaves.append(seg.reshape(shape))
    return jax.tree.unflatten(treedef, leaves)


def fetch_tree(tree):
    """Fetch a pytree of device arrays to host with async prefetch: issue
    every copy first (they stream in parallel), then gather.  ALWAYS use
    this instead of bare np.asarray on fresh device arrays — a synchronous
    fetch serializes one RPC round trip per leaf over a tunnel transport."""
    leaves = jax.tree.leaves(tree)
    for leaf in leaves:
        try:
            leaf.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
    return jax.tree.map(np.asarray, tree)


class Program:
    """A chain compiled against (in_spec, block, batch_shape): owns the
    streaming state and the jitted step."""

    def __init__(self, chain: Stage, in_spec: StreamSpec, block: int,
                 batch_shape=(), donate_state: bool = True):
        self.chain = chain
        self.in_spec = in_spec
        self.block = block
        self.batch_shape = batch_shape
        self.out_spec, self.out_block = chain.plan(in_spec, block)
        self._in_complex = bool(in_spec.format.is_complex)
        params0 = chain.params()
        self._params_cache = params0
        self._params_ver = chain.params_version()
        x_aval = jax.ShapeDtypeStruct(
            (block,), np.complex64 if self._in_complex else np.float32)
        s_aval = jax.eval_shape(lambda: chain.init_state(batch_shape))
        _, y_aval, aux_aval = jax.eval_shape(chain.apply, s_aval, params0,
                                             x_aval)
        self._s_mask = jax.tree.map(_is_complex_aval, s_aval)
        self._y_codec = jax.tree.map(_leaf_codec, y_aval)
        self._aux_codec = jax.tree.map(_leaf_codec, aux_aval)
        self._fuse_treedef, self._fuse_plan, self._fuse_words = fuse_plan(
            y_aval, aux_aval, self._y_codec, self._aux_codec)
        # complex state buffers can't be created eagerly on the tunnel —
        # build them inside a jit that returns the packed representation
        self.state = jax.jit(
            lambda: jax.tree.map(_pack_leaf, chain.init_state(batch_shape)))()
        # snapshot of structural keys at build time — rebuild() matches OLD
        # states to new workers through these, never through post-surgery
        # worker objects (whose states they are not)
        self._state_keys = (
            [(w.label, w.signature()) for w in chain.workers]
            if isinstance(chain, Chain) else []
        )
        key = (chain.signature(), in_spec, block, batch_shape, donate_state)
        step = _PROGRAM_CACHE.get(key)
        if step is None:
            s_mask, in_complex = self._s_mask, self._in_complex
            y_codec, aux_codec = self._y_codec, self._aux_codec

            def _step(pstate, params, px):
                state = jax.tree.map(_unpack_leaf, pstate, s_mask)
                x = _unpack_leaf(px, in_complex)
                new_state, y, aux = chain.apply(state, params, x)
                y_enc = jax.tree.map(_encode_out_leaf, y, y_codec)
                aux_enc = jax.tree.map(_encode_out_leaf, aux, aux_codec)
                return (jax.tree.map(_pack_leaf, new_state),
                        fuse_leaves(jax.tree.leaves((y_enc, aux_enc))))
            step = jax.jit(_step, donate_argnums=(0,) if donate_state else ())
            _PROGRAM_CACHE[key] = step
        self._step = step

    def _params(self):
        """Current param pytree, re-materialized only when a setter bumped
        the chain's params version (see module docstring)."""
        v = self.chain.params_version()
        if v != self._params_ver:
            self._params_cache = self.chain.params()
            self._params_ver = v
        return self._params_cache

    def pack_input(self, x):
        """Host complex block → packed (block, 2) float32, validated.  The
        result can be jax.device_put once and shared by every program of the
        device (one tunnel transfer per block instead of one per program)."""
        if self._in_complex:
            if getattr(x, "ndim", 0) >= 2 and x.shape[-1] == 2 \
                    and x.shape[-2] == self.block \
                    and getattr(x, "dtype", None) in (np.float32, np.int16,
                                                      np.uint8):
                # already packed: float32 pairs, or int16/uint8 wire
                # samples (converted to float on-device — half / quarter
                # the transfer bytes)
                return x
            if x.shape[-1] != self.block:
                raise ValueError(
                    f"Program expects blocks of {self.block} samples, got "
                    f"{x.shape[-1]} (shapes are static under jit — feed "
                    f"exactly Program.block samples per call)")
            return host_pack_complex(np.asarray(x))
        if x.shape[-1] != self.block:
            raise ValueError(
                f"Program expects blocks of {self.block} samples, got "
                f"{x.shape[-1]} (shapes are static under jit — feed exactly "
                f"Program.block samples per call)")
        return x

    def dispatch(self, x, to_host: bool = True):
        """Dispatch one block WITHOUT fetching: returns (fused, None) where
        fused is the in-flight single int32 output buffer (all output
        leaves of the program fused on device — ONE device→host transfer
        per block; see fuse_plan).  Dispatch every program of a device
        first, then fetch() — JAX's async dispatch then overlaps the
        device work and transfers instead of serializing round trips.
        to_host=False skips starting the copy — for callers that join
        several programs' buffers into one transfer (DeviceRuntime's
        per-block cross-program join)."""
        self.state, fused = self._step(self.state, self._params(),
                                       self.pack_input(x))
        # start the device→host copy NOW: over a tunnel-attached TPU a
        # synchronous fetch is a serial RPC; initiating the copy async here
        # lets it stream back while the host does other work
        if to_host:
            try:
                fused.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return fused, None

    def fetch(self, fused, _unused=None):
        """Unpack a dispatch() result: one device→host fetch of the fused
        buffer, then zero-copy views per leaf.  Complex outputs come back
        as np complex64, sub-word outputs as their original dtype/shape."""
        buf = np.asarray(fused)
        from openwebrx_tpu.runtime.keepalive import TransportKeepalive
        TransportKeepalive.note_fetch()
        yp, auxp = unfuse_buffer(buf, self._fuse_treedef, self._fuse_plan)
        y = jax.tree.map(_decode_out_leaf, yp, self._y_codec)
        aux = jax.tree.map(_decode_out_leaf, auxp, self._aux_codec)
        return y, aux

    def process(self, x):
        """One block: host (or device) array in → (y, aux) out."""
        return self.fetch(*self.dispatch(x))

    def dispatch_quiet(self, x):
        """Dispatch without initiating the device→host copy — for callers
        that batch several blocks' results into one transfer
        (join_pending)."""
        self.state, fused = self._step(self.state, self._params(),
                                       self.pack_input(x))
        return fused, None

    def join_pending(self, pends):
        """Concatenate several dispatch results ON DEVICE into one buffer
        (one device→host transfer for K blocks — background/digimode
        consumers tolerate the batched delivery; see ChannelizedBank
        delivery_stride for the serving-path version)."""
        joined = jnp.concatenate([p[0] for p in pends])
        try:
            joined.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return joined, len(pends)

    def fetch_many(self, joined, n: int):
        """Decode a join_pending batch → list of n (y, aux), in order."""
        buf = np.asarray(joined)
        from openwebrx_tpu.runtime.keepalive import TransportKeepalive
        TransportKeepalive.note_fetch()
        out = []
        for i in range(n):
            seg = buf[i * self._fuse_words:(i + 1) * self._fuse_words]
            yp, auxp = unfuse_buffer(seg, self._fuse_treedef,
                                     self._fuse_plan)
            out.append((jax.tree.map(_decode_out_leaf, yp, self._y_codec),
                        jax.tree.map(_decode_out_leaf, auxp,
                                     self._aux_codec)))
        return out

    def rebuild(self, keep_state: bool = True):
        """Re-plan after graph surgery, carrying over state of stages whose
        label+signature still match (reference behavior: live replace keeps
        the rest of the stream running, csdr/chain/__init__.py:53-84)."""
        old = {}
        if keep_state and isinstance(self.chain, Chain):
            old = dict(zip(self._state_keys, self.state))
        self.__init__(self.chain, self.in_spec, self.block, self.batch_shape)
        if old and isinstance(self.chain, Chain):
            self.state = tuple(
                old.get((w.label, w.signature()), s)
                for w, s in zip(self.chain.workers, self.state)
            )


def choose_block_size(in_rate: float, target_seconds: float, *divisors: int) -> int:
    """Pick a block size ≈ target_seconds·in_rate divisible by all divisors."""
    base = 1
    for d in divisors:
        if d > 0:
            base = base * d // gcd(base, d)
    want = max(1, int(round(in_rate * target_seconds / base)))
    return want * base
