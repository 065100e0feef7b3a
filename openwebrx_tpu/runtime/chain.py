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

    @abc.abstractmethod
    def plan(self, in_spec: StreamSpec, block: int) -> tuple[StreamSpec, int]:
        """Compute static config; return (out_spec, out_block)."""

    def init_state(self, batch_shape=()):
        return ()

    def params(self):
        return ()

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

    def insert(self, index: int, stage: Stage):
        self.workers.insert(index, stage)
        self._planned = False

    def remove(self, index: int):
        del self.workers[index]
        self._planned = False

    def append(self, stage: Stage):
        self.workers.append(stage)
        self._planned = False

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


# program-level jit cache: structural signature → compiled step
_PROGRAM_CACHE: dict[tuple, callable] = {}


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
        self.state = chain.init_state(batch_shape)
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
            def _step(state, params, x):
                return chain.apply(state, params, x)
            step = jax.jit(_step, donate_argnums=(0,) if donate_state else ())
            _PROGRAM_CACHE[key] = step
        self._step = step

    def process(self, x):
        """One block: host (or device) array in → (y, aux) device arrays out."""
        if x.shape[-1] != self.block:
            raise ValueError(
                f"Program expects blocks of {self.block} samples, got "
                f"{x.shape[-1]} (shapes are static under jit — feed exactly "
                f"Program.block samples per call)")
        self.state, y, aux = self._step(self.state, self.chain.params(), x)
        return y, aux

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
