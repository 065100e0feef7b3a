"""Streaming runtime: declarative chains compiled to jitted block programs.

Replaces the reference's thread-per-module pull graph (reference
``csdr/chain/__init__.py`` Chain + ``csdr/module/__init__.py`` Module
hierarchy) with pure functional stages composed into ONE jitted step per
chain: ``(state, params, block) → (state, out, aux)``.  Live graph surgery
(mode switch, rate change — reference ``Chain.replace/insert/remove``) is a
re-plan + re-jit, cached by structural signature; parameter changes
(retune, squelch, passband drag) are traced-array updates and never
recompile.
"""

from openwebrx_tpu.runtime.chain import Stage, Chain, Program, choose_block_size

__all__ = ["Stage", "Chain", "Program", "choose_block_size"]
