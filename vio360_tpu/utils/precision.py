"""Library-scoped matmul precision.

TPU matmuls default to bf16 inputs; the estimation stack is built on
small, ill-conditioned dense systems (inertial Hessians, Schur
complements, SO(3) chains) where 8 mantissa bits are NOT enough:
measured end-to-end on the real chip, default precision sends VIBA to
a 36% worse cost with 4x-off bias estimates and compounds into a 90%
metric-scale error over a 30-frame run (CPU reference: 3.5%). True
f32 (6-pass) costs nothing at these sizes — the FLOP-heavy kernels
(LK one-hot gathers, pyramid operators, Pallas megakernels) manage
their own precision explicitly and are unaffected.

Scoping: every ``jax.jit`` boundary in this library goes through
:func:`jit` below, which enters ``jax.default_matmul_precision
("float32")`` for the duration of the TRACE (precision is stamped onto
the traced dot ops at trace time). This replaces the former
process-global ``jax.config.update`` import side effect, which silently
changed the numerics of unrelated JAX code in the same process.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Run ``fn`` (typically a trace) under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def jit(fn=None, **jit_kwargs):
    """``jax.jit`` whose trace runs under float32 matmul precision.

    Drop-in for ``jax.jit`` / ``functools.partial(jax.jit, ...)`` at
    every compiled boundary of this library.
    """
    if fn is None:
        return functools.partial(jit, **jit_kwargs)
    return jax.jit(f32_matmuls(fn), **jit_kwargs)
