"""Tracing, graph inspection and profiling helpers.

Rebuild of the reference's debug surface (``tensors.py:25-33,77-83``:
NanGuard-gated Print ops, pydotprint graph dumps) on jax-native machinery:
``jax.debug.print`` / ``jax.debug.callback`` for in-graph value taps,
jaxpr/HLO dumps for graph inspection, ``jax.profiler`` traces for timing,
and a ``debug_nans`` switch mirroring Theano's NanGuardMode.
"""

import contextlib
import os

import jax
import numpy as np

__all__ = [
    "debug",
    "show_graph",
    "print_graph",
    "debug_mode",
    "profile_trace",
    "set_debug",
]

_DEBUG = bool(os.environ.get("G3PY_DEBUG", ""))


def set_debug(on=True):
    """Enable in-graph value taps globally (the reference gated its Print
    ops on NanGuardMode/DebugMode, tensors.py:25-33)."""
    global _DEBUG
    _DEBUG = bool(on)


def debug(x, name="", force=False):
    """Pass-through value tap: prints inside jit when debugging is enabled.

    Mirrors the reference ``debug(tensor, name)`` contract — returns its
    input so it can be inserted mid-expression."""
    if _DEBUG or force:
        jax.debug.print(name + " = {}", x)
    return x


def show_graph(fn, *example_args, path=None):
    """Render a jitted function's optimized HLO (the reference used
    pydotprint, tensors.py:77-80).  Returns the HLO text; writes it to
    ``path`` when given."""
    lowered = jax.jit(fn).lower(*example_args)
    txt = lowered.compile().as_text()
    if path:
        with open(path, "w") as f:
            f.write(txt)
    return txt


def print_graph(fn, *example_args):
    """Print the jaxpr (the reference's ``print_graph``, tensors.py:82-83)."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    print(jaxpr)
    return jaxpr


@contextlib.contextmanager
def debug_mode(nans=True):
    """NanGuardMode analogue: raise on NaN production inside jitted code."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def profile_trace(path="/tmp/g3py_trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()
